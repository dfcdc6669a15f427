"""Native frame stages vs NumPy fallback."""

import numpy as np

from nbody_simulation_tpu.runtime import frame as nf


def test_native_lib_builds():
    assert nf._frame_lib() is not None, "g++ should be available here"


def test_reconstruct_matches_numpy(rng):
    render = 64
    npix = render * render
    n = 500
    idx = rng.integers(0, npix + 100, n).astype(np.int32)  # some OOB padding
    vals = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    got = nf.reconstruct(idx, vals, render)
    want = np.zeros(npix, np.uint32)
    ok = idx < npix
    want[idx[ok]] = vals[ok]
    np.testing.assert_array_equal(
        got, want.view(np.uint8).reshape(render, render, 4))


def test_composite_black(rng):
    f = rng.integers(0, 256, (16, 16, 4)).astype(np.uint8)
    got = nf.composite_black(f)
    a = f[..., 3:4].astype(np.uint16)
    want = (f[..., :3].astype(np.uint16) * a // 255).astype(np.uint8)
    np.testing.assert_array_equal(got, want)
