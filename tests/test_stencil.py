"""Gaussian-blur stencil tests: conv and Pallas engines vs a literal numpy
reimplementation of the reference kernel (GaussianBlurCpu.cpp:12-34)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.ops import stencil
from lbm_tpu.utils import image as img_lib

RNG = np.random.default_rng(3)


def np_blur(padded: np.ndarray, interior=None) -> np.ndarray:
    """Reference semantics: write interior of the zero-padded array only.
    `interior` masks to the true image box (alignment padding stays zero)."""
    out = np.zeros_like(padded)
    p = padded
    out[:, 1:-1, 1:-1] = (
        2.0 * (p[:, :-2, 1:-1] + p[:, 2:, 1:-1] + p[:, 1:-1, :-2] + p[:, 1:-1, 2:])
        + (p[:, :-2, :-2] + p[:, :-2, 2:] + p[:, 2:, :-2] + p[:, 2:, 2:])
        + 4.0 * p[:, 1:-1, 1:-1]
    ) / 16.0
    if interior is not None:
        out *= interior
    return out


def make_padded(h=30, w=126):
    chans = RNG.uniform(0, 1, size=(4, h, w)).astype(np.float32)
    padded, interior, (ph, pw) = img_lib.pad_to_tile(chans)
    assert (ph, pw) == (h, w)
    return padded, interior


@pytest.mark.parametrize("engine", ["conv", "pallas"])
def test_single_step_matches_numpy(engine):
    padded, interior = make_padded()
    step = {"conv": stencil.blur_step_conv, "pallas": stencil.blur_step_pallas}[engine]
    out = np.asarray(step(jnp.asarray(padded), jnp.asarray(interior)))
    expected = np_blur(padded)
    # pad ring (and alignment padding) must stay exactly zero
    np.testing.assert_array_equal(out * (1 - interior), 0.0)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("engine", ["conv", "pallas", "resident"])
def test_iterated_blur_matches_numpy(engine):
    padded, interior = make_padded(14, 62)
    out = np.asarray(
        stencil.blur_many(jnp.asarray(padded), jnp.asarray(interior),
                          num_iters=3, engine=engine)
    )
    expected = padded
    for _ in range(6):
        expected = np_blur(expected, interior)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("k_passes", [2, 3, 4, 6])
def test_k_pass_blur_matches_numpy(k_passes):
    """Temporal-blocked blur (K passes per HBM sweep) == K iterated passes."""
    padded, interior = make_padded(30, 126)
    out = np.asarray(
        stencil.blur_k_pallas(jnp.asarray(padded), jnp.asarray(interior),
                              k_passes=k_passes)
    )
    expected = padded
    for _ in range(k_passes):
        expected = np_blur(expected, interior)
    np.testing.assert_array_equal(out * (1 - interior), 0.0)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-6)


def test_k_pass_blur_many_matches_single_pass_engine():
    """blur_many(k_passes=4) == blur_many(pallas single-pass), 8 passes."""
    padded, interior = make_padded(30, 126)
    x, m = jnp.asarray(padded), jnp.asarray(interior)
    out_k = np.asarray(stencil.blur_many(x, m, num_iters=4, engine="pallas",
                                         k_passes=4))
    out_1 = np.asarray(stencil.blur_many(x, m, num_iters=4, engine="pallas"))
    np.testing.assert_allclose(out_k, out_1, rtol=1e-5, atol=1e-7)


def test_k_pass_blur_band_decomposition_independent():
    """Different bands give identical results (overlap recomputation)."""
    padded, interior = make_padded(30, 126)  # padded h = 32
    x, m = jnp.asarray(padded), jnp.asarray(interior)
    a = np.asarray(stencil.blur_k_pallas(x, m, k_passes=4, band=8))
    b = np.asarray(stencil.blur_k_pallas(x, m, k_passes=4, band=16))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_k_pass_rejects_bad_args():
    padded, interior = make_padded(14, 62)
    x, m = jnp.asarray(padded), jnp.asarray(interior)
    with pytest.raises(ValueError, match="k_passes"):
        stencil.blur_k_pallas(x, m, k_passes=9)
    with pytest.raises(ValueError, match="divide"):
        stencil.blur_many(x, m, num_iters=3, engine="pallas", k_passes=4)


def test_bfloat16_engine_runs_and_approximates():
    padded, interior = make_padded(14, 62)
    out_bf = np.asarray(
        stencil.blur_many(jnp.asarray(padded, jnp.bfloat16),
                          jnp.asarray(interior, jnp.bfloat16),
                          num_iters=2, engine="conv"),
        dtype=np.float32,
    )
    expected = padded
    for _ in range(4):
        expected = np_blur(expected, interior)
    np.testing.assert_allclose(out_bf, expected, rtol=0.1, atol=0.05)


def test_blur_conserves_mass_interior():
    """Away from boundaries the kernel sums to 1 — a constant image stays
    constant in its interior."""
    chans = np.full((4, 30, 126), 0.5, np.float32)
    padded, interior, _ = img_lib.pad_to_tile(chans)
    out = np.asarray(stencil.blur_step_conv(jnp.asarray(padded), jnp.asarray(interior)))
    # rows/cols >=2 cells from the image edge see no zero ghost
    np.testing.assert_allclose(out[:, 3:-3, 3:-3][:, : 30 - 4, : 126 - 4], 0.5, rtol=1e-6)


class TestImageUtils:
    def test_float_roundtrip(self):
        rgba = RNG.integers(10, 250, size=(20, 30, 4), dtype=np.uint8)
        f = img_lib.to_float_image(rgba)
        assert f.intensities.min() >= 0.0 and f.intensities.max() <= 1.0
        back = img_lib.to_char_image(f)
        np.testing.assert_allclose(back.astype(int), rgba.astype(int), atol=1)

    def test_constant_channel(self):
        rgba = np.full((8, 8, 4), 77, np.uint8)
        f = img_lib.to_float_image(rgba)
        np.testing.assert_array_equal(f.intensities, 0.0)

    def test_pad_to_tile_alignment(self):
        chans = np.ones((4, 30, 126), np.float32)
        padded, interior, (h, w) = img_lib.pad_to_tile(chans)
        assert padded.shape[1] % 8 == 0 and padded.shape[2] % 128 == 0
        assert interior.sum() == 30 * 126
        np.testing.assert_array_equal(padded[:, 1:31, 1:127], chans)

    def test_png_roundtrip(self, tmp_path):
        rgba = RNG.integers(0, 255, size=(12, 17, 4), dtype=np.uint8)
        img_lib.save_png(tmp_path / "x.png", rgba)
        back = img_lib.load_png(tmp_path / "x.png")
        np.testing.assert_array_equal(back, rgba)

    def test_load_reference_image(self, reference_dir):
        rgba = img_lib.load_png(f"{reference_dir}/images/test-small.png")
        assert rgba.ndim == 3 and rgba.shape[2] == 4


class TestShardedBlur:
    """Multi-device blur (the reference's gaussian-blur-scaling axis): the
    conv engine on a sharded image is partitioned by XLA (implicit halos)."""

    def test_sharded_conv_blur_matches_local(self):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        if len(jax.devices()) < 8:
            import pytest as _pytest

            _pytest.skip("needs 8 virtual devices")
        chans = RNG.uniform(0, 1, size=(4, 62, 510)).astype(np.float32)
        padded, interior, _ = img_lib.pad_to_tile(chans)
        local = np.asarray(stencil.blur_many(
            jnp.asarray(padded), jnp.asarray(interior), num_iters=3))

        mesh = jax.sharding.Mesh(
            np.array(jax.devices()[:8]).reshape(2, 4), ("ry", "rx"))
        xs = jax.device_put(jnp.asarray(padded),
                            NamedSharding(mesh, P(None, "ry", "rx")))
        ins = jax.device_put(jnp.asarray(interior),
                             NamedSharding(mesh, P("ry", "rx")))
        sharded = np.asarray(stencil.blur_many(xs, ins, num_iters=3))
        np.testing.assert_allclose(sharded, local, rtol=1e-5, atol=1e-7)


def test_resident_fits_predicate():
    small = jnp.zeros((4, 320, 512), jnp.float32)
    big = jnp.zeros((4, 2048, 2048), jnp.float32)
    assert stencil.resident_fits(small)
    assert not stencil.resident_fits(big)


def test_auto_engine_dispatch():
    """engine='auto' picks resident for small images and runs correctly."""
    from lbm_tpu.models import blur as blur_model

    rgba = (RNG.uniform(0, 255, size=(24, 40, 4))).astype(np.uint8)
    out, _ = blur_model.blur_image(rgba, num_iters=2, engine="auto")
    ref, _ = blur_model.blur_image(rgba, num_iters=2, engine="resident")
    np.testing.assert_array_equal(out, ref)


def test_resident_rejects_oversized_image():
    big = jnp.zeros((4, 2048, 2048), jnp.float32)
    inter = jnp.zeros((2048, 2048), jnp.float32)
    with pytest.raises(ValueError, match="resident"):
        stencil.blur_resident(big, inter, num_passes=2)
