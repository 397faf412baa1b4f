"""Two-pass warp (ops/warp_twopass.py + ops/warp_pallas.py) parity tests.

Contract (module docstrings): the two-pass decomposition equals the direct
bilinear sampler EXACTLY for axis-aligned scale+translation, and to
sub-pixel order in the interior of the valid region under rotation /
perspective / distortion (border transition band may differ by one tap).
The Mosaic kernel adds <= 1 LSB from intermediate uint8 repacking; here it
runs in interpreter mode on the CPU mesh (the real-chip timing/parity run
is scripts/exp_twopass_chip.py: 274.8 -> 10.0 ms at bs256, sum parity 4e-5).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from metro_pose3d_tpu.ops import warp as W
from metro_pose3d_tpu.ops.warp_twopass import warp_images_twopass_xla
from metro_pose3d_tpu.ops.warp_pallas import warp_images_twopass_pallas


def _params(rng, b, tile, side, perspective=False, dist_on=False, rot=0.5):
    hs = []
    for _ in range(b):
        ang = rng.uniform(-rot, rot)
        sc = rng.uniform(0.8, 1.8)
        c, s = np.cos(ang), np.sin(ang)
        a = np.array([[sc * c, -sc * s], [sc * s, sc * c]])
        centre_src = np.array([tile / 2, tile / 2]) + rng.uniform(-6, 6, 2)
        t = centre_src - a @ np.array([side / 2, side / 2])
        hmat = np.eye(3)
        hmat[:2, :2] = a
        hmat[:2, 2] = t
        if perspective:
            hmat[2, :2] = rng.uniform(-1, 1, 2) * 1e-3
        hs.append(hmat)
    h = jnp.asarray(np.stack(hs), jnp.float32)
    k = jnp.tile(jnp.asarray([1.0, 1.0, 0.0, 0.0], jnp.float32)[None], (b, 1))
    d = jnp.zeros((b, 5), jnp.float32)
    if dist_on:
        f = float(tile)
        pre = np.array([[1 / f, 0, -tile / 2 / f], [0, 1 / f, -tile / 2 / f], [0, 0, 1]])
        h = jnp.asarray(np.stack([pre @ np.asarray(x) for x in np.asarray(h)]), jnp.float32)
        k = jnp.tile(jnp.asarray([f, f, tile / 2, tile / 2], jnp.float32)[None], (b, 1))
        d = jnp.tile(
            jnp.asarray([-0.15, 0.03, 5e-4, -5e-4, 0.01], jnp.float32)[None], (b, 1)
        )
    return h, k, d


def _interior_mask(h, k, d, tile, side, margin=2.0):
    coords, _ = jax.vmap(lambda hh, kk, dd: W.warp_coords(hh, kk, dd, (side, side)))(h, k, d)
    u, v = np.asarray(coords[..., 0]), np.asarray(coords[..., 1])
    return np.minimum.reduce([u, v, (tile - 2) - u, (tile - 2) - v]) > margin


def test_twopass_exact_on_axis_aligned():
    rng = np.random.RandomState(0)
    b, tile, side = 6, 64, 32
    tiles = jnp.asarray(rng.randint(0, 256, (b, tile, tile, 3)), jnp.uint8)
    hs = []
    for _ in range(b):
        sc = rng.uniform(0.7, 1.8)
        tx, ty = rng.uniform(-5, 5, 2)
        hs.append(np.array([[sc, 0, tx], [0, sc, ty], [0, 0, 1.0]]))
    h = jnp.asarray(np.stack(hs), jnp.float32)
    k = jnp.tile(jnp.asarray([1.0, 1.0, 3.0, 2.0], jnp.float32)[None], (b, 1))
    d = jnp.zeros((b, 5), jnp.float32)
    ref = np.asarray(W.warp_images_reference(tiles.astype(jnp.float32), h, k, d, side))
    two = np.asarray(warp_images_twopass_xla(tiles, h, k, d, side))
    np.testing.assert_allclose(two, ref, atol=1e-3)


@pytest.mark.parametrize("dist_on", [False, True])
def test_twopass_interior_subpixel(dist_on):
    rng = np.random.RandomState(1)
    b, tile, side = 6, 64, 32
    # ramp images measure GEOMETRIC error in source pixels directly
    xr = np.tile(np.arange(tile, dtype=np.float32)[None, :, None], (tile, 1, 3))
    yr = np.tile(np.arange(tile, dtype=np.float32)[:, None, None], (1, tile, 3))
    h, k, d = _params(rng, b, tile, side, perspective=True, dist_on=dist_on)
    interior = _interior_mask(h, k, d, tile, side)
    assert interior.sum() > b * side * side // 4
    for img in (xr, yr):
        tiles = jnp.asarray(np.tile(img[None], (b, 1, 1, 1)), jnp.uint8)
        ref = np.asarray(W.warp_images_reference(tiles.astype(jnp.float32), h, k, d, side))
        two = np.asarray(warp_images_twopass_xla(tiles, h, k, d, side))
        err = np.abs(ref - two)[..., 0][interior]
        assert err.max() < 0.05, err.max()  # < 1/20 source pixel geometric


def test_pallas_kernel_matches_xla_twopass():
    rng = np.random.RandomState(2)
    b, tile, side = 3, 128, 128
    tiles = jnp.asarray(rng.randint(0, 256, (b, tile, tile, 3)), jnp.uint8)
    h, k, d = _params(rng, b, tile, side, perspective=True)
    xla = np.asarray(warp_images_twopass_xla(tiles, h, k, d, side))
    with pltpu.force_tpu_interpret_mode():
        pk = np.asarray(warp_images_twopass_pallas(tiles, h, k, d, side))
    # <= 1 LSB from the kernel's intermediate uint8 repacking
    assert np.abs(xla - pk).max() <= 1.0 + 1e-5


def _assert_one_lsb(base, skip, max_frac=2e-4):
    diff = np.abs(base - skip)
    assert diff.max() <= 1.0 + 1e-5, diff.max()
    assert (diff > 0).mean() <= max_frac, (diff > 0).mean()


def test_skip_ranges_one_lsb():
    """The range-skip kernel (`skip_ranges`) only ever removes work whose
    blend weight is exactly zero, so in exact arithmetic it equals the
    unpredicated kernel bit-for-bit. In COMPILED arithmetic the predicated
    (lax.cond-wrapped) field math may contract mul+add chains differently
    (FMA), flipping the post-lerp uint8 rounding by one on rare
    boundary-straddling pixels — measured 10/147456 here, and verified to
    collapse to 0 when the predicates are constant-folded to True. The
    contract is therefore: <= 1 LSB, on a vanishing fraction of pixels.
    Tiles here are 256+ wide/tall so both passes really have multiple
    128-chunks to skip (the other kernel tests use 128^2 tiles where no
    skipping can occur)."""
    rng = np.random.RandomState(11)
    side = 128

    # per-crop tiles: rotation + perspective, then with distortion
    for dist_on in (False, True):
        b, tile = 3, 256
        tiles = jnp.asarray(rng.randint(0, 256, (b, tile, tile, 3)), jnp.uint8)
        h, k, d = _params(rng, b, tile, side, perspective=True, dist_on=dist_on)
        with pltpu.force_tpu_interpret_mode():
            base = np.asarray(warp_images_twopass_pallas(
                tiles, h, k, d, side, skip_ranges=False))
            skip = np.asarray(warp_images_twopass_pallas(
                tiles, h, k, d, side, skip_ranges=True))
        _assert_one_lsb(base, skip)

    # near +-90 deg: the transposed-source reroute combined with skipping
    b, tile = 2, 256
    tiles = jnp.asarray(rng.randint(0, 256, (b, tile, tile, 3)), jnp.uint8)
    hs = []
    for ang in (np.pi / 2 - 0.01, -np.pi / 2 + 0.02):
        c, s = np.cos(ang), np.sin(ang)
        a = 1.1 * np.array([[c, -s], [s, c]])
        t = np.array([tile / 2, tile / 2]) - a @ np.array([side / 2, side / 2])
        hmat = np.eye(3)
        hmat[:2, :2] = a
        hmat[:2, 2] = t
        hs.append(hmat)
    h = jnp.asarray(np.stack(hs), jnp.float32)
    k = jnp.tile(jnp.asarray([1.0, 1.0, 0.0, 0.0], jnp.float32)[None], (b, 1))
    d = jnp.zeros((b, 5), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(warp_images_twopass_pallas(
            tiles, h, k, d, side, skip_ranges=False))
        skip = np.asarray(warp_images_twopass_pallas(
            tiles, h, k, d, side, skip_ranges=True))
    _assert_one_lsb(base, skip)

    # frame mode (nsrc=1, non-square): crops in opposite corners, so the
    # live row/column ranges differ per crop
    b, th, tw = 2, 256, 384
    frame = jnp.asarray(rng.randint(0, 256, (1, th, tw, 3)), jnp.uint8)
    hs = []
    for cx, cy in ((40.0, 30.0), (tw - 170.0, th - 160.0)):
        hmat = np.eye(3)
        hmat[0, 2] = cx
        hmat[1, 2] = cy
        hs.append(hmat)
    h = jnp.asarray(np.stack(hs), jnp.float32)
    k = jnp.tile(jnp.asarray([1.0, 1.0, 0.0, 0.0], jnp.float32)[None], (b, 1))
    d = jnp.zeros((b, 5), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(warp_images_twopass_pallas(
            frame, h, k, d, side, skip_ranges=False))
        skip = np.asarray(warp_images_twopass_pallas(
            frame, h, k, d, side, skip_ranges=True))
    _assert_one_lsb(base, skip)


def test_dispatcher_padding_and_frame_mode():
    rng = np.random.RandomState(3)
    b, side = 3, 128
    # 200x320 smooth frame: padded to 256x384 inside the dispatcher.
    # Smooth content so the sub-pixel two-pass phase difference stays small
    # in value space (gradient <= ~12/px); geometric exactness is pinned by
    # test_twopass_interior_subpixel.
    yy, xx = np.meshgrid(np.arange(200), np.arange(320), indexing="ij")
    img = (np.sin((xx + 2 * yy) / 9.0) * 100 + 120).astype(np.float32)
    frame = jnp.asarray(np.tile(img[..., None], (1, 1, 3)), jnp.uint8)
    h, k, d = _params(rng, b, 200, side, rot=0.3)
    packed = np.asarray(W.warp_from_frame(frame, h, k, d, side, sampler="packed"))
    with pltpu.force_tpu_interpret_mode():
        two = np.asarray(W.warp_from_frame(frame, h, k, d, side, sampler="twopass"))
    interior = _interior_mask(h, k, d, 200, side) & _interior_mask(h, k, d, 320, side)
    err = np.abs(packed - two)[..., 0][interior]
    assert np.median(err) <= 1.0
    assert err.max() <= 4.0


def test_occluder_twopass_matches_bank_path():
    from metro_pose3d_tpu.ops.occlusion import (
        occlude_with_bank, occlude_with_bank_twopass,
        pack_occluder_bank, pack_occluder_bank_raw,
    )

    rng = np.random.RandomState(5)
    b, side, t2, n = 6, 128, 96, 8
    bank = np.zeros((n, t2, t2, 4), np.float32)
    yy, xx = np.meshgrid(np.arange(t2), np.arange(t2), indexing="ij")
    for i in range(n):
        bank[i, ..., :3] = np.sin((xx + (i + 1) * yy) / 7.0)[..., None] * 0.4 + 0.5
        bank[i, ..., 3] = ((xx - t2 / 2) ** 2 + (yy - t2 / 2) ** 2 < (t2 * 0.4) ** 2)
    bank = jnp.asarray(bank)
    crops = jnp.asarray(rng.uniform(0, 1, (b, side, side, 3)), jnp.float32)
    idx = jnp.asarray(rng.randint(0, n, (b,)), jnp.int32)
    # full-range rotations including the near +-90 deg degenerate band the
    # transposed-tile swap exists for
    angles = [-np.pi / 2 + 0.01, np.pi / 2 - 0.005, 0.3, -2.9, 1.3, 2.2]
    affs = []
    for i in range(b):
        th = angles[i]
        sc = 1.0 / rng.uniform(0.2, 0.7)
        c, s = np.cos(th), np.sin(th)
        m = sc * np.array([[c, -s], [s, c]])
        centre = rng.uniform(0.1, 0.9, 2) * side
        aff = np.zeros((2, 3))
        aff[:, :2] = m
        aff[:, 2] = np.array([t2 / 2, t2 / 2]) - m @ centre
        affs.append(aff)
    affs = jnp.asarray(np.stack(affs), jnp.float32)
    en = jnp.ones((b,), jnp.float32)

    ref = np.asarray(occlude_with_bank(crops, pack_occluder_bank(bank), t2, idx, affs, en))
    with pltpu.force_tpu_interpret_mode():
        two = np.asarray(
            occlude_with_bank_twopass(crops, pack_occluder_bank_raw(bank), idx, affs, en)
        )
    diff = np.abs(ref - two)
    # sub-pixel two-pass phase + 8-bit repacking; alpha edges may move by
    # one tap (the transition-band semantics documented in warp_pallas.py)
    assert diff.mean() < 2e-3
    assert (diff > 0.05).mean() < 1e-3


@pytest.mark.parametrize("ang", [np.pi / 2 - 0.01, -np.pi / 2 + 0.02, np.pi / 2])
def test_near_90deg_rotation_reroutes_and_matches(ang):
    """ADVICE r2: the Catmull-Smith bottleneck (pass-1 denominator -> 0 near
    +-90 deg in-plane rotation) previously produced silent garbage. The
    transposed-source reroute must make both two-pass paths match the exact
    direct sampler to sub-pixel order there."""
    from metro_pose3d_tpu.ops.warp_twopass import choose_swap

    rng = np.random.RandomState(9)
    b, tile, side = 2, 128, 128
    hs = []
    for _ in range(b):
        sc = rng.uniform(0.9, 1.3)
        c, s = np.cos(ang), np.sin(ang)
        a = sc * np.array([[c, -s], [s, c]])
        centre_src = np.array([tile / 2, tile / 2])
        t = centre_src - a @ np.array([side / 2, side / 2])
        hmat = np.eye(3)
        hmat[:2, :2] = a
        hmat[:2, 2] = t
        hs.append(hmat)
    h = jnp.asarray(np.stack(hs), jnp.float32)
    k = jnp.tile(jnp.asarray([1.0, 1.0, 0.0, 0.0], jnp.float32)[None], (b, 1))
    d = jnp.zeros((b, 5), jnp.float32)
    assert bool(choose_swap(h, k, d, tile, tile).all())

    # smooth ramp: geometric error shows directly in value space
    yy, xx = np.meshgrid(np.arange(tile), np.arange(tile), indexing="ij")
    img = (np.sin((xx + 2 * yy) / 9.0) * 100 + 120).astype(np.float32)
    tiles = jnp.asarray(np.tile(img[None, ..., None], (b, 1, 1, 3)), jnp.uint8)
    exact = np.asarray(W.warp_images(tiles, h, k, d, side, sampler="packed"))
    xla = np.asarray(warp_images_twopass_xla(tiles, h, k, d, side))
    with pltpu.force_tpu_interpret_mode():
        pk = np.asarray(warp_images_twopass_pallas(tiles, h, k, d, side))
    interior = _interior_mask(h, k, d, tile, side)
    for got, name in ((xla, "xla"), (pk, "kernel")):
        err = np.abs(exact - got)[..., 0][interior]
        assert np.median(err) <= 1.0, (name, np.median(err))
        assert err.max() <= 12.0, (name, err.max())  # was ~unbounded garbage


def test_choose_swap_keeps_ordinary_rotations_on_default_route():
    from metro_pose3d_tpu.ops.warp_twopass import choose_swap

    rng = np.random.RandomState(10)
    h, k, d = _params(rng, 8, 128, 128, perspective=True, rot=0.6)  # <=34 deg
    assert not bool(choose_swap(h, k, d, 128, 128).any())


def test_dispatcher_auto_off_tpu_is_packed():
    rng = np.random.RandomState(4)
    b, tile, side = 2, 64, 32
    tiles = jnp.asarray(rng.randint(0, 256, (b, tile, tile, 3)), jnp.uint8)
    h, k, d = _params(rng, b, tile, side)
    auto = np.asarray(W.warp_images(tiles, h, k, d, side))
    packed = np.asarray(W.warp_images(tiles, h, k, d, side, sampler="packed"))
    np.testing.assert_array_equal(auto, packed)


def test_newton_iters_zero_matches_without_distortion():
    """aug.warp_newton_iters=0 must match the default for distortion-free
    cameras to float precision (the closed-form inverse is exact there; the
    Newton steps only re-round it, so a floor() can flip by one ulp — pin
    GEOMETRIC agreement on ramp images instead of bitwise values)."""
    rng = np.random.RandomState(7)
    b, tile, side = 4, 64, 32
    h, k, d = _params(rng, b, tile, side, perspective=True)
    for ramp in (
        np.tile(np.arange(tile, dtype=np.float32)[None, :, None], (tile, 1, 3)),
        np.tile(np.arange(tile, dtype=np.float32)[:, None, None], (1, tile, 3)),
    ):
        tiles = jnp.asarray(np.tile(ramp[None], (b, 1, 1, 1)), jnp.uint8)
        full = np.asarray(warp_images_twopass_xla(tiles, h, k, d, side, newton_iters=3))
        zero = np.asarray(warp_images_twopass_xla(tiles, h, k, d, side, newton_iters=0))
        assert np.abs(full - zero).max() < 1e-2  # source-pixel units
