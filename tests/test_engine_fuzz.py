"""Randomised cross-engine parity: the Pallas kernel must agree with the
pure-JAX engine across random grid shapes, bands, K depths, obstacle layouts
and accelerated-row positions (stable equilibrium+perturbation states)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.ops import d2q9, d2q9_pallas, d2q9_pallas_manual

CASES = list(range(8))


@pytest.mark.parametrize("seed", CASES)
def test_random_config_parity(seed):
    rng = np.random.default_rng(1000 + seed)
    ny = 8 * int(rng.integers(2, 9))          # 16..64
    nx = 128 * int(rng.integers(1, 3))        # 128 or 256
    bands = [b for b in (8, 16, 24, 32) if ny % b == 0]
    band = int(rng.choice(bands))
    k = int(rng.choice([1, 2, 3, 4, 6, 8]))  # full supported K range
    steps = k * int(rng.integers(1, 3))
    accel_row = int(rng.integers(0, ny))      # anywhere, incl. wrap edges
    omega = float(rng.uniform(0.6, 1.9))
    w1 = float(rng.uniform(0, 1e-4))
    w2 = w1 / 4

    f = (0.1 / 9) * (1 + 0.02 * rng.uniform(-1, 1, size=(9, ny, nx)))
    f = f.astype(np.float32)
    mask = rng.uniform(size=(ny, nx)) < 0.1   # 10% random obstacles

    amask = d2q9.accel_row_mask(ny, nx, accel_row)
    f_ref = jnp.asarray(f)
    tots_ref = []
    for _ in range(steps):
        f_ref, t = d2q9.step(f_ref, jnp.asarray(mask), amask,
                             omega=omega, accel_w1=w1, accel_w2=w2)
        tots_ref.append(float(t))

    f_pl, tots = d2q9_pallas.run(
        jnp.asarray(f), jnp.asarray(mask, np.float32), num_steps=steps,
        omega=omega, accel_w1=w1, accel_w2=w2, accel_row=accel_row,
        band=band, k_steps=k,
    )
    np.testing.assert_allclose(np.asarray(f_pl), np.asarray(f_ref),
                               rtol=2e-4, atol=1e-6,
                               err_msg=f"ny={ny} nx={nx} band={band} k={k} "
                                       f"steps={steps} accel_row={accel_row}")
    np.testing.assert_allclose(np.asarray(tots), tots_ref, rtol=2e-4)

    if ny // band >= 2:  # the manual pipeline needs two bands in flight
        f_man, tots_man = d2q9_pallas_manual.run(
            jnp.asarray(f), jnp.asarray(mask, np.float32), num_steps=steps,
            omega=omega, accel_w1=w1, accel_w2=w2, accel_row=accel_row,
            band=band, k_steps=k,
        )
        assert np.array_equal(np.asarray(f_man), np.asarray(f_pl)), (
            f"manual!=auto ny={ny} nx={nx} band={band} k={k}")
        assert np.array_equal(np.asarray(tots_man), np.asarray(tots))
