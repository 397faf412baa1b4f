"""Unit semantics of the shared packed windowed gather primitive."""
import jax.numpy as jnp
import numpy as np

from metro_pose3d_tpu.ops.packed_gather import (
    bilinear_weights,
    build_windowed_table,
    gather_bilinear_taps,
    tap_masks,
)


def _img(h, w, n=1):
    # texel value encodes its (n, y, x) so taps are self-identifying
    vals = np.arange(n * h * w, dtype=np.int32).reshape(n, h, w)
    return jnp.asarray(vals)


class TestTable:
    def test_row_layout(self):
        h, w = 4, 6
        table = np.asarray(build_windowed_table(_img(h, w)))
        assert table.shape == (h * (w // 2), 6)
        # row (y=1, k=2): texels (1..2) x (4..6); col 6 is zero pad
        row = table[1 * 3 + 2]
        np.testing.assert_array_equal(row[:3], [1 * w + 4, 1 * w + 5, 0])
        np.testing.assert_array_equal(row[3:], [2 * w + 4, 2 * w + 5, 0])

    def test_last_row_pairs_with_pad(self):
        h, w = 4, 6
        table = np.asarray(build_windowed_table(_img(h, w)))
        row = table[3 * 3 + 0]  # y = 3 (last), k = 0
        np.testing.assert_array_equal(row[3:], [0, 0, 0])  # pad row


class TestTaps:
    def test_interior_and_borders(self):
        h, w = 4, 6
        table = build_windowed_table(_img(h, w))
        x0 = jnp.asarray([[2, -1, 5, 0]])
        y0 = jnp.asarray([[1, 0, 3, -1]])
        base = jnp.zeros((1, 1), jnp.int32)
        a_l, a_r, b_l, b_r = gather_bilinear_taps(table, base, x0, y0, h, w)
        a_l, a_r, b_l, b_r = (np.asarray(t)[0] for t in (a_l, a_r, b_l, b_r))

        # interior (x0=2, y0=1): taps are exactly the 2x2 neighborhood
        assert a_l[0] == 1 * w + 2 and a_r[0] == 1 * w + 3
        assert b_l[0] == 2 * w + 2 and b_r[0] == 2 * w + 3
        # left border (x0=-1): right taps read column 0
        assert a_r[1] == 0 * w + 0 and b_r[1] == 1 * w + 0
        # top border (y0=-1): bottom taps read row 0
        assert b_l[3] == 0 * w + 0 and b_r[3] == 0 * w + 1

        m00, m01, m10, m11 = (np.asarray(m)[0] for m in tap_masks(x0, y0, h, w))
        assert m00[0] and m01[0] and m10[0] and m11[0]          # interior
        assert not m00[1] and m01[1]                             # x0=-1
        assert not m10[2] and not m11[2]                         # y0=3 bottom
        assert not m00[3] and m10[3]                             # y0=-1

    def test_weights_sum_to_one(self):
        fx = jnp.asarray([[0.25, 0.0, 0.9]])
        fy = jnp.asarray([[0.5, 0.0, 0.1]])
        w = bilinear_weights(fx, fy)
        total = sum(np.asarray(x)[..., 0] for x in w)
        np.testing.assert_allclose(total, 1.0, rtol=1e-6)
