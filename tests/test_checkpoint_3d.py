"""Checkpoint/resume for the 3-D engines (models/lbm3d.py).

Same contract as the 2-D suite (test_checkpoint.py): chunked runs are
bit-identical to uninterrupted runs of the same engine config; resume
continues exactly; signature mismatches are rejected."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from lbm_tpu.core import checkpoint
from lbm_tpu.models import lbm3d as lbm3d_model
from lbm_tpu.ops import d3q19_native

SHAPE = (8, 8, 16)


def run(tmp_path, engine, every, steps=12, resume=False, name="ck.npz"):
    return lbm3d_model.run_simulation_with_checkpoints(
        *SHAPE, num_steps=steps, checkpoint_path=tmp_path / name,
        checkpoint_every=every, engine=engine, resume=resume)


ENGINES = ["jax", "pallas"] + (["native"] if d3q19_native.available() else [])


@pytest.mark.parametrize("engine", ENGINES)
def test_chunked_equals_uninterrupted(tmp_path, engine):
    f1, av1, *_ = run(tmp_path, engine, every=12, name="a.npz")
    f2, av2, *_ = run(tmp_path, engine, every=4, name="b.npz")
    assert np.array_equal(av1, av2)
    assert np.array_equal(f1, f2)


@pytest.mark.parametrize("engine", ENGINES)
def test_resume_continues_exactly(tmp_path, engine):
    f_full, av_full, *_ = run(tmp_path, engine, every=4, steps=12, name="f.npz")
    # interrupted: run only 8 steps, then resume to 12
    run(tmp_path, engine, every=4, steps=8, name="r.npz")
    f_res, av_res, *_ = run(tmp_path, engine, every=4, steps=12, resume=True,
                           name="r.npz")
    assert np.array_equal(av_res, av_full)
    assert np.array_equal(f_res, f_full)


def test_mismatched_signature_rejected(tmp_path):
    run(tmp_path, "jax", every=4, steps=4)
    with pytest.raises(ValueError, match="grid"):
        lbm3d_model.run_simulation_with_checkpoints(
            8, 8, 32, num_steps=8, checkpoint_path=tmp_path / "ck.npz",
            checkpoint_every=4, engine="jax", resume=True)
    with pytest.raises(ValueError, match="physics"):
        lbm3d_model.run_simulation_with_checkpoints(
            *SHAPE, num_steps=8, checkpoint_path=tmp_path / "ck.npz",
            checkpoint_every=4, engine="jax", resume=True, omega=1.2)


def test_2d_checkpoint_rejected_by_3d_loader(tmp_path):
    from lbm_tpu.core.params import Params

    p = Params(nx=16, ny=8, max_iters=4, reynolds_dim=10, density=0.1,
               accel=0.005, omega=1.85)
    checkpoint.save(tmp_path / "2d.npz", np.zeros((9, 8, 16)), np.zeros(4),
                    4, p)
    with pytest.raises(ValueError, match="not a 3-D"):
        checkpoint.load3d(tmp_path / "2d.npz")


def test_cli_checkpoint_resume(tmp_path):
    base = [sys.executable, "-m", "lbm_tpu.cli.lbm3d", "--nz", "8", "--ny",
            "8", "--nx", "16", "--device", "cpu", "--out-dir", str(tmp_path)]
    r1 = subprocess.run(base + ["-n", "6", "--checkpoint-every", "3"],
                        capture_output=True, text=True, timeout=300,
                        cwd=Path(__file__).parent.parent)
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = subprocess.run(base + ["-n", "12", "--checkpoint-every", "3",
                                "--resume"],
                        capture_output=True, text=True, timeout=300,
                        cwd=Path(__file__).parent.parent)
    assert r2.returncode == 0, r2.stderr[-2000:]
    av = np.loadtxt(tmp_path / "av_vels_3d.dat", usecols=1, delimiter="\t")
    assert av.size == 12


def _needs_devices(n=8):
    import jax

    if len(jax.devices()) < n:
        pytest.skip("needs 8 virtual devices")


def test_sharded_pallas_chunked_equals_uninterrupted(tmp_path):
    _needs_devices()
    f1, av1, *_ = lbm3d_model.run_simulation_with_checkpoints(
        16, 16, 128, num_steps=8, checkpoint_path=tmp_path / "a.npz",
        checkpoint_every=8, engine="sharded-pallas", num_devices=4)
    f2, av2, *_ = lbm3d_model.run_simulation_with_checkpoints(
        16, 16, 128, num_steps=8, checkpoint_path=tmp_path / "b.npz",
        checkpoint_every=2, engine="sharded-pallas", num_devices=4)
    assert np.array_equal(av1, av2)
    assert np.array_equal(f1, f2)


def test_sharded_pallas_resume_on_other_mesh(tmp_path):
    """A checkpoint written on a 2-shard mesh resumes on a 4-shard mesh:
    the gathered global state is mesh-independent (valid cells only)."""
    _needs_devices()
    nz = 22  # uneven: exercises pad-and-mask through the checkpoint path
    full_f, full_av, *_ = lbm3d_model.run_simulation_with_checkpoints(
        nz, 16, 128, num_steps=8, checkpoint_path=tmp_path / "f.npz",
        checkpoint_every=2, engine="sharded-pallas", num_devices=4)
    lbm3d_model.run_simulation_with_checkpoints(
        nz, 16, 128, num_steps=4, checkpoint_path=tmp_path / "r.npz",
        checkpoint_every=2, engine="sharded-pallas", num_devices=2)
    f_res, av_res, *_ = lbm3d_model.run_simulation_with_checkpoints(
        nz, 16, 128, num_steps=8, checkpoint_path=tmp_path / "r.npz",
        checkpoint_every=2, engine="sharded-pallas", num_devices=4,
        resume=True)
    assert f_res.shape == (19, nz, 16, 128)
    # cross-mesh resume: same physics; psum reduction order differs with
    # shard count (measured ~3e-6 rel on the first post-resume steps)
    np.testing.assert_allclose(av_res, full_av, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(f_res, full_f, rtol=1e-5, atol=1e-9)


def test_pallas_rejects_explicit_k_not_dividing_nz(tmp_path):
    """nz=7, k_steps=2 used to pass validation and silently fetch misaligned
    ghost planes (choose_config degrades bz to 1); must now raise."""
    with pytest.raises(ValueError, match="k_steps"):
        lbm3d_model.run_simulation_with_checkpoints(
            7, 8, 16, num_steps=4, checkpoint_path=tmp_path / "x.npz",
            checkpoint_every=2, engine="pallas", k_steps=2)


def test_select_k_steps_engine_rules():
    # odd nz forces K=1 on single-chip pallas...
    assert lbm3d_model.select_k_steps("pallas", 4, 2, 7) == 1
    assert lbm3d_model.select_k_steps("pallas", 4, 2, 8) == 2
    # ...but NOT on sharded-pallas (plan_planes pads uneven nz)
    assert lbm3d_model.select_k_steps("sharded-pallas", 4, 2, 7,
                                      n_shards=2) == 2
    # unless the pad plan is infeasible for the mesh: nz=7 on 4 shards at
    # K=2 leaves the last shard < K valid planes -> fall back to K=1
    assert lbm3d_model.select_k_steps("sharded-pallas", 4, 2, 7,
                                      n_shards=4) == 1
    # chunking divisibility still wins
    assert lbm3d_model.select_k_steps("sharded-pallas", 4, 3, 8,
                                      n_shards=2) == 1


def test_sharded_pallas_auto_k_on_odd_nz(tmp_path):
    """Odd-nz sharded-pallas checkpointed run picks K=2 (pad-and-mask) and
    matches the jax engine physics."""
    _needs_devices()
    nz, ny, nx = 7, 8, 128
    f_s, av_s, *_ = lbm3d_model.run_simulation_with_checkpoints(
        nz, ny, nx, num_steps=4, checkpoint_path=tmp_path / "s.npz",
        checkpoint_every=2, engine="sharded-pallas", num_devices=2)
    f_j, av_j, *_ = lbm3d_model.run_simulation_with_checkpoints(
        nz, ny, nx, num_steps=4, checkpoint_path=tmp_path / "j.npz",
        checkpoint_every=2, engine="jax")
    assert f_s.shape == (19, nz, ny, nx)
    np.testing.assert_allclose(av_s, av_j, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(f_s, f_j, rtol=1e-4, atol=1e-7)


def test_3d_checkpoint_rejected_by_2d_loader(tmp_path):
    checkpoint.save3d(tmp_path / "3d.npz", np.zeros((19, 4, 8, 16)),
                      np.zeros(2), 2, omega=1.85, density=0.1, accel=0.005)
    with pytest.raises(ValueError, match="3-D"):
        checkpoint.load(tmp_path / "3d.npz")
