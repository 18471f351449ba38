"""The public API documented in docs/API.md exists and stays put.

One assertion per documented symbol (docs/API.md is the user-facing
contract; this test is the drift alarm). Import cost only — no compiles.
"""

import importlib

import pytest

# module path -> documented public symbols (docs/API.md)
API = {
    "lbm_tpu.core.params": [
        "Params", "Obstacles", "reynolds_number"],
    "lbm_tpu.core.state": [
        "initial_distributions", "macroscopics", "average_velocity",
        "total_density"],
    "lbm_tpu.core.io": [
        "write_av_vels", "read_av_vels", "final_state_fields",
        "write_final_state", "write_final_state_arrays", "read_final_state"],
    "lbm_tpu.core.checkpoint": [
        "Checkpoint", "Checkpoint3D", "save", "load", "save3d", "load3d"],
    "lbm_tpu.ops.d2q9": [
        "AccelWeights", "stream_pull", "collide_fields", "collide",
        "equilibrium", "accel_row_mask", "step", "first_accelerate",
        "run", "simulate"],
    "lbm_tpu.ops.d2q9_pallas": [
        "choose_band", "choose_config", "choose_engine",
        "default_vmem_limit", "stepk", "step", "run", "simulate"],
    "lbm_tpu.ops.d2q9_pallas_inplace": [
        "choose_config", "default_vmem_limit", "stepk", "run", "simulate"],
    "lbm_tpu.ops.d2q9_native": ["available", "run", "simulate"],
    "lbm_tpu.ops.d3q19": [
        "equilibrium", "stream_pull", "collide_fields", "step",
        "accel_plane_mask", "run", "simulate"],
    "lbm_tpu.ops.d3q19_lattice": ["initial_distributions"],
    "lbm_tpu.ops.d3q19_pallas": [
        "choose_config", "default_vmem_limit", "stepk", "run"],
    "lbm_tpu.ops.d3q19_pallas_inplace": [
        "default_vmem_limit", "stepk", "run"],
    "lbm_tpu.ops.d3q19_native": ["available", "run", "simulate"],
    "lbm_tpu.ops.stencil": [
        "blur_step_conv", "blur_step_pallas", "blur_k_pallas",
        "resident_fits", "blur_resident", "blur_many"],
    "lbm_tpu.parallel.mesh": [
        "best_factorisation", "make_mesh", "grid_sharding", "mask_sharding",
        "shard_padding", "pad_grid"],
    "lbm_tpu.parallel.halo": [
        "ring_shift", "exchange_halos_2wave", "exchange_halos_2wave_padded",
        "exchange_halos_allgather", "exchange_halos_naive",
        "exchange_halos_manytensors", "exchange_halos_none",
        "make_sharded_step", "run_sharded", "prepare_sharded",
        "simulate_sharded"],
    "lbm_tpu.parallel.pallas_sharded": [
        "make_row_mesh", "make_mesh2d", "plan_rows", "extended_mask",
        "make_chunk_fn", "run", "prepare", "simulate"],
    "lbm_tpu.parallel.pallas_sharded_3d": [
        "make_z_mesh", "plan_planes", "extended_mask", "make_chunk_fn",
        "make_overlap_chunk_fn", "run", "simulate"],
    "lbm_tpu.parallel.partition": [
        "Slice2D", "Target", "partition_for_devices", "to_band_partitions",
        "dispatch_strategy", "to_block_partitions",
        "fixed_overlay_partitions", "serialize_to_json", "stats",
        "PartitionStats"],
    "lbm_tpu.models.lbm": [
        "LbmResult", "run_simulation", "run_simulation_with_checkpoints",
        "run_simulation_sharded", "write_outputs", "print_summary"],
    "lbm_tpu.models.lbm3d": [
        "select_k_steps", "run_simulation_with_checkpoints",
        "final_state_slice_fields", "write_final_state_slice"],
    "lbm_tpu.models.blur": ["blur_image", "blur_file"],
    "lbm_tpu.utils.profiling": [
        "select_platform", "timed", "trace", "dump_hlo",
        "enable_compilation_cache", "aot_compile", "export_executable",
        "load_executable", "enable_nan_debugging", "device_memory_stats"],
    "lbm_tpu.utils.image": [
        "FloatImage", "load_png", "save_png", "to_float_image",
        "to_char_image", "zero_pad", "strip_padding", "pad_to_tile"],
    "lbm_tpu.utils.roll_slices": [
        "RegionCopy", "determine_src_dst_slices", "rolled_copy",
        "copy_volumes"],
    "lbm_tpu.utils.native_io": ["NativeIO", "build", "load"],
}


@pytest.mark.parametrize("module", sorted(API))
def test_documented_symbols_exist(module):
    mod = importlib.import_module(module)
    missing = [name for name in API[module] if not hasattr(mod, name)]
    assert not missing, (
        f"{module} lost documented API symbols {missing} — "
        f"update docs/API.md and this test together")
