"""Checkpoint/resume: chunked runs must be BIT-identical to uninterrupted
runs, resume must continue exactly, and the checkpoint file must be atomic
and validated. Beyond-reference capability (the reference checkpoints no
in-flight state, SURVEY.md §5)."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from lbm_tpu.core import checkpoint
from lbm_tpu.core.params import Obstacles, Params
from lbm_tpu.models import lbm as lbm_model

REPO = Path(__file__).resolve().parent.parent
REF = os.environ.get("LBM_REFERENCE_DIR", "/root/reference")

needs_ref = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference data")


@pytest.fixture(scope="module")
def case():
    p = Params.from_file(f"{REF}/params/input_128x128.params")
    obs = Obstacles.from_file(f"{REF}/params/obstacles_128x128.dat", p)
    return p, obs


@needs_ref
@pytest.mark.parametrize("engine,every", [("jax", 25), ("pallas", 20)])
def test_chunked_equals_uninterrupted(case, engine, every, tmp_path):
    # pallas chunks must stay multiples of K=4 (kernels compiled at
    # different K differ at the ulp level); jax chunks are arbitrary
    p, obs = case
    direct = lbm_model.run_simulation(p, obs, engine=engine, num_steps=60)
    chunked = lbm_model.run_simulation_with_checkpoints(
        p, obs, engine=engine, num_steps=60,
        checkpoint_path=tmp_path / "ck.npz", checkpoint_every=every,
    )
    np.testing.assert_array_equal(chunked.av_vels, direct.av_vels)
    np.testing.assert_array_equal(chunked.f_final, direct.f_final)


@needs_ref
def test_pallas_checkpoint_rejects_misaligned_chunks(case, tmp_path):
    p, obs = case
    # explicit K that doesn't divide the chunking is rejected...
    with pytest.raises(ValueError, match="divisible"):
        lbm_model.run_simulation_with_checkpoints(
            p, obs, engine="pallas", num_steps=60, k_steps=4,
            checkpoint_path=tmp_path / "ck.npz", checkpoint_every=25)
    # ...but k_steps=None auto-selects the deepest K dividing both (here
    # K=1), so any step count the plain CLI accepts also checkpoints
    res = lbm_model.run_simulation_with_checkpoints(
        p, obs, engine="pallas", num_steps=60,
        checkpoint_path=tmp_path / "ck.npz", checkpoint_every=25)
    assert res.av_vels.size == 60


@needs_ref
def test_resume_continues_exactly(case, tmp_path):
    p, obs = case
    ck = tmp_path / "ck.npz"
    direct = lbm_model.run_simulation(p, obs, num_steps=50)
    # run 30 steps, "crash", resume for the remaining 20
    lbm_model.run_simulation_with_checkpoints(
        p, obs, num_steps=30, checkpoint_path=ck, checkpoint_every=10)
    resumed = lbm_model.run_simulation_with_checkpoints(
        p, obs, num_steps=50, checkpoint_path=ck, checkpoint_every=10,
        resume=True)
    assert resumed.av_vels.shape == (50,)
    np.testing.assert_array_equal(resumed.av_vels, direct.av_vels)
    np.testing.assert_array_equal(resumed.f_final, direct.f_final)


def test_checkpoint_rejects_mismatched_grid(tmp_path):
    p = Params(nx=16, ny=16, max_iters=4, reynolds_dim=10,
               density=0.1, accel=0.005, omega=1.85)
    checkpoint.save(tmp_path / "ck.npz", np.zeros((9, 16, 16), np.float32),
                    np.zeros(2), 2, p)
    other = Params(nx=32, ny=16, max_iters=4, reynolds_dim=10,
                   density=0.1, accel=0.005, omega=1.85)
    with pytest.raises(ValueError, match="does not match"):
        checkpoint.load(tmp_path / "ck.npz", expect=other)
    back = checkpoint.load(tmp_path / "ck.npz", expect=p)
    assert back.step == 2 and back.f.shape == (9, 16, 16)


@needs_ref
def test_cli_checkpoint_resume_roundtrip(case, tmp_path):
    env = dict(os.environ, PYTHONPATH=str(REPO))

    def cli(*extra):
        return subprocess.run(
            [sys.executable, "-m", "lbm_tpu.cli.lbm",
             "--params", f"{REF}/params/input_128x128.params",
             "--obstacles", f"{REF}/params/obstacles_128x128.dat",
             "--device", "cpu", "--out-dir", str(tmp_path), *extra],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=240,
        )

    r1 = cli("--num-steps", "20", "--checkpoint-every", "10")
    assert r1.returncode == 0, r1.stderr
    assert (tmp_path / "checkpoint.npz").exists()
    r2 = cli("--num-steps", "40", "--checkpoint-every", "10", "--resume")
    assert r2.returncode == 0, r2.stderr
    direct = cli("--num-steps", "40")
    assert direct.returncode == 0, direct.stderr
    got = np.loadtxt(tmp_path / "av_vels.dat", usecols=1, delimiter="\t")
    assert got.shape == (40,)


@needs_ref
def test_resume_beyond_requested_steps_errors(case, tmp_path):
    p, obs = case
    ck = tmp_path / "ck.npz"
    lbm_model.run_simulation_with_checkpoints(
        p, obs, num_steps=30, checkpoint_path=ck, checkpoint_every=30)
    with pytest.raises(ValueError, match="beyond"):
        lbm_model.run_simulation_with_checkpoints(
            p, obs, num_steps=20, checkpoint_path=ck, checkpoint_every=10,
            resume=True)


def test_checkpoint_rejects_mismatched_physics(tmp_path):
    p = Params(nx=16, ny=16, max_iters=4, reynolds_dim=10,
               density=0.1, accel=0.005, omega=1.85)
    checkpoint.save(tmp_path / "ck.npz", np.zeros((9, 16, 16), np.float32),
                    np.zeros(2), 2, p)
    import dataclasses
    other = dataclasses.replace(p, accel=0.01)
    with pytest.raises(ValueError, match="does not match"):
        checkpoint.load(tmp_path / "ck.npz", expect=other)


@needs_ref
@pytest.mark.parametrize("engine,kw", [
    ("sharded", {"strategy": "ppermute"}),
    ("sharded", {"strategy": "implicit"}),
    ("sharded-pallas", {}),
])
def test_sharded_chunked_equals_uninterrupted(case, engine, kw, tmp_path):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    p, obs = case
    direct = lbm_model.run_simulation_with_checkpoints(
        p, obs, engine=engine, num_steps=40, num_devices=8,
        checkpoint_path=tmp_path / "a.npz", checkpoint_every=40, **kw)
    chunked = lbm_model.run_simulation_with_checkpoints(
        p, obs, engine=engine, num_steps=40, num_devices=8,
        checkpoint_path=tmp_path / "b.npz", checkpoint_every=20, **kw)
    np.testing.assert_array_equal(chunked.av_vels, direct.av_vels)
    np.testing.assert_array_equal(chunked.f_final, direct.f_final)


@needs_ref
def test_sharded_resume_matches_sharded_direct(case, tmp_path):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    p, obs = case
    ck = tmp_path / "ck.npz"
    direct = lbm_model.run_simulation_with_checkpoints(
        p, obs, engine="sharded", num_steps=40, num_devices=8,
        checkpoint_path=tmp_path / "d.npz", checkpoint_every=40)
    lbm_model.run_simulation_with_checkpoints(
        p, obs, engine="sharded", num_steps=20, num_devices=8,
        checkpoint_path=ck, checkpoint_every=20)
    resumed = lbm_model.run_simulation_with_checkpoints(
        p, obs, engine="sharded", num_steps=40, num_devices=8,
        checkpoint_path=ck, checkpoint_every=20, resume=True)
    np.testing.assert_array_equal(resumed.av_vels, direct.av_vels)
    np.testing.assert_array_equal(resumed.f_final, direct.f_final)


@needs_ref
def test_resume_adopts_and_guards_recorded_k(case, tmp_path):
    """Checkpoints record the K they were chunked at; auto-K resume must
    adopt it (never silently re-chunk at a different K — kernels compiled
    at different K differ at the ulp level), and an explicit conflicting
    K must be rejected."""
    from lbm_tpu.core import checkpoint

    p, obs = case
    ck = tmp_path / "ck.npz"
    lbm_model.run_simulation_with_checkpoints(
        p, obs, engine="pallas", num_steps=16, k_steps=2,
        checkpoint_path=ck, checkpoint_every=8)
    assert checkpoint.load(ck).k_steps == 2
    with pytest.raises(ValueError, match="k_steps=2"):
        lbm_model.run_simulation_with_checkpoints(
            p, obs, engine="pallas", num_steps=32, k_steps=4,
            checkpoint_path=ck, checkpoint_every=8, resume=True)
    # auto-K adopts the writer's K even when the auto rule would differ
    res = lbm_model.run_simulation_with_checkpoints(
        p, obs, engine="pallas", num_steps=32,
        checkpoint_path=ck, checkpoint_every=8, resume=True)
    assert res.av_vels.shape == (32,)
    assert checkpoint.load(ck).k_steps == 2
