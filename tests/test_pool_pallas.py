"""Stem max-pool: Pallas kernel vs XLA reference vs lax.reduce_window SAME.

The pool must match TF/XLA "SAME" alignment exactly (window at 2i..2i+2),
because the reference's slim backbone uses `max_pool2d(..., 'SAME')` and
ImageNet weight conversion requires bit-parity of the stem
(SURVEY.md §8 hard part 1).
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from metro_pose3d_tpu.ops.pool_pallas import (
    _maxpool_fwd_pallas,
    _maxpool_reference,
    _maxpool_reference_odd,
    max_pool_3x3_stride2_same,
)


def _rw_same(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME")


class TestAlignment:
    def test_reference_matches_reduce_window_even(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 12, 5))
        np.testing.assert_array_equal(
            np.asarray(_maxpool_reference(x)), np.asarray(_rw_same(x))
        )

    def test_reference_matches_reduce_window_odd(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 15, 13, 4))
        np.testing.assert_array_equal(
            np.asarray(_maxpool_reference_odd(x)), np.asarray(_rw_same(x))
        )

    def test_public_op_dispatch(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 3))
        np.testing.assert_array_equal(
            np.asarray(max_pool_3x3_stride2_same(x)), np.asarray(_rw_same(x))
        )


class TestPallasKernel:
    def test_interpret_matches_reference(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (3, 32, 32, 64), jnp.float32)
        out = _maxpool_fwd_pallas(x, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(_rw_same(x)))

    def test_interpret_bfloat16(self):
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 8)).astype(
            jnp.bfloat16
        )
        out = _maxpool_fwd_pallas(x, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(out.astype(jnp.float32)),
            np.asarray(_rw_same(x.astype(jnp.float32))),
        )


class TestGradient:
    def test_grad_finite_and_correct(self):
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 4))

        def f(x):
            return jnp.sum(max_pool_3x3_stride2_same(x) ** 2)

        g = jax.grad(f)(x)
        assert np.all(np.isfinite(np.asarray(g)))
        # gradient of max routes to the argmax input element: sum of grads
        # equals sum of 2*out over windows (each output's grad lands once)
        out = _rw_same(x)
        np.testing.assert_allclose(
            float(jnp.sum(g * x_argmax_mask_free_check(x, g))),
            float(jnp.sum(2 * out**2)),
            rtol=1e-5,
        )

    def test_grad_odd_spatial_dims(self):
        """ADVICE r1: fwd (reduce_window SAME) accepts odd dims, so the
        custom-vjp backward must too (it routes through the any-parity
        shift-and-max now)."""
        x = jax.random.normal(jax.random.PRNGKey(6), (1, 15, 15, 2))

        def f(x):
            return jnp.sum(max_pool_3x3_stride2_same(x) ** 2)

        g = jax.grad(f)(x)
        assert g.shape == x.shape
        assert np.all(np.isfinite(np.asarray(g)))
        out = _rw_same(x)
        np.testing.assert_allclose(
            float(jnp.sum(g * x)), float(jnp.sum(2 * out**2)), rtol=1e-5
        )


def x_argmax_mask_free_check(x, g):
    # helper: g is nonzero only at window-max positions; g = sum over windows
    # of 2*out at the max position, so g*x accumulates 2*out*max = 2*out^2.
    return x


class TestMasksBackward:
    """Round-3 fast pool backward (_maxpool_bwd_masks): dense mask+interleave
    form replacing the max-tree VJP (POOL_BWD_IMPL)."""

    def _maxtree_grad(self, x, g):
        from metro_pose3d_tpu.ops.pool_pallas import _maxpool_reference_odd

        _, vjp = jax.vjp(_maxpool_reference_odd, x)
        return vjp(g)[0]

    def test_matches_maxtree_unique_maxima(self):
        from metro_pose3d_tpu.ops.pool_pallas import _maxpool_bwd_masks

        for shape, key in (((2, 16, 12, 5), 7), ((1, 15, 13, 3), 8)):
            x = jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)
            out = _rw_same(x)
            g = jax.random.normal(
                jax.random.PRNGKey(key + 1), out.shape, jnp.float32)
            np.testing.assert_allclose(
                np.asarray(_maxpool_bwd_masks(x, out, g)),
                np.asarray(self._maxtree_grad(x, g)), atol=1e-6)

    def test_tie_mass_preserved(self):
        """On ties the masks form splits each window's gradient equally;
        total per-window mass must be preserved exactly."""
        from metro_pose3d_tpu.ops.pool_pallas import _maxpool_bwd_masks

        x = jnp.ones((1, 8, 8, 1), jnp.float32)  # every window fully tied
        out = _rw_same(x)
        g = jnp.ones((1, 4, 4, 1), jnp.float32)
        grad = np.asarray(_maxpool_bwd_masks(x, out, g))
        assert grad.shape == x.shape
        np.testing.assert_allclose(grad.sum(), float(g.sum()), rtol=1e-6)
        assert (grad >= 0).all()

    def test_public_op_custom_bwd_selectable(self):
        # Chip A/B (2026-08-17, scripts/exp_stem_bwd.py): masks LOST on the
        # v5e (45.4 vs 28.8 ms), so the custom-bwd default is "maxtree" and
        # "masks" stays selectable as the ledger entry. Both must produce
        # the same gradient away from ties.
        from metro_pose3d_tpu.ops import pool_pallas as P

        assert P.POOL_BWD_IMPL == "maxtree"
        x = jax.random.normal(jax.random.PRNGKey(9), (2, 32, 32, 8), jnp.float32)

        def f(x):
            return jnp.sum(max_pool_3x3_stride2_same(x) ** 2)

        old = P.POOL_BWD_IMPL
        try:
            P.POOL_BWD_IMPL = "masks"
            g = jax.grad(f)(x)
        finally:
            P.POOL_BWD_IMPL = old
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(jax.grad(f)(x)), atol=1e-6)
        out = _rw_same(x)
        np.testing.assert_allclose(
            float(jnp.sum(g * x)), float(jnp.sum(2 * out**2)), rtol=1e-5)


class TestStemPoolTrainRouting:
    """Round-3 train/inference routing (`stem_max_pool`): training uses the
    shift-max autodiff form (fastest fwd+bwd on chip — ledger in
    ops/pool_pallas.py), inference the reduce_window custom_vjp. Forward
    values and (away from ties) gradients must agree between the routes."""

    def test_forward_and_grad_agree_across_routes(self):
        from metro_pose3d_tpu.ops.pool_pallas import stem_max_pool

        for mi, mode in enumerate(("same", "torch", "keras")):
            for shape in ((2, 16, 16, 4), (1, 15, 13, 3)):
                x = jax.random.normal(
                    jax.random.PRNGKey(20 + mi), shape, jnp.float32)
                f_inf = lambda x: jnp.sum(stem_max_pool(x, mode, train=False) ** 2)
                f_tr = lambda x: jnp.sum(stem_max_pool(x, mode, train=True) ** 2)
                np.testing.assert_allclose(
                    np.asarray(stem_max_pool(x, mode, train=True)),
                    np.asarray(stem_max_pool(x, mode, train=False)),
                    atol=0, err_msg=f"forward mismatch mode={mode}")
                np.testing.assert_allclose(
                    np.asarray(jax.grad(f_tr)(x)),
                    np.asarray(jax.grad(f_inf)(x)),
                    atol=1e-6, err_msg=f"grad mismatch mode={mode}")
