#!/usr/bin/env python3
"""Split the sharded step's cost into compute vs halo exchange.

Reference analogue: experiments/gaussian-blur-scaling/exchange-vs-compute.csv
(on 16 IPUs global exchange ~3-4k cycles vs compute 4.4-13k — comparable!).

Two honest sections. (Wall-clock SUBTRACTION — timing ppermute vs a
zero-exchange run and differencing — was retired in round 3: on the shared
host the delta sits below noise for 1024²+ and round 2's CSV recorded a
negative exchange time. Per-op attribution does not subtract anything.)

1. profiled (platform column = cpu): per-XLA-op time attribution from a
   jax.profiler trace of the ppermute run on the 8-virtual-device CPU mesh
   (profile_breakdown.classify buckets ops into exchange / sync / compute).
   Collectives are memcpys + thread rendezvous there, so the ratios are NOT
   ICI ratios — the value is op-level attribution: how much of the schedule
   is collectives at all, and how it scales with the per-shard block.

2. model (platform = tpu-v5e-model): the real-hardware answer this
   environment cannot measure (one chip, no ICI). Per step and per shard of
   a ry x rx mesh, the 2-wave exchange moves
       bytes = 9 planes * 2 directions * (w_shard + h_shard+2) * 4B
   over ICI, while compute moves ~19 * h*w * 4B over HBM (the fused kernel's
   2x9 planes + mask). With v5e HBM ~820 GB/s and ICI ~100 GB/s/link
   (public v5e figure: 1,600 Gbps aggregate = ~200 GB/s, 2 links per axis),
   exchange_pct = ici_time / (ici_time + hbm_time) assuming no overlap (an
   upper bound: XLA overlaps collectives with compute).

Usage: python experiments/exchange-vs-compute/run.py [iters]
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

HBM_GBPS = 820.0   # v5e HBM bandwidth (docs/TUNING.md roofline)
ICI_GBPS = 100.0   # per-link per-direction working figure (see docstring)


def model_row(ny, nx, r, c):
    h, w = ny // r, nx // c
    # wave 1: 2 rows of 9 planes x w cols; wave 2: 2 cols x (h+2) rows
    ici_bytes = 9 * 4 * (2 * w + (2 * (h + 2) if c > 1 else 0))
    hbm_bytes = 19 * h * w * 4
    t_ici = ici_bytes / (ICI_GBPS * 1e9)
    t_hbm = hbm_bytes / (HBM_GBPS * 1e9)
    pct = 100 * t_ici / (t_ici + t_hbm)
    return ici_bytes, hbm_bytes, t_ici, t_hbm, pct


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    out_path = os.path.join(os.path.dirname(__file__), "results.csv")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import profile_breakdown as pb

    with open(out_path, "w") as out:
        out.write("section,platform,grid,mesh,iters,total_s,compute_only_s,"
                  "exchange_s,exchange_pct,below_noise\n")
        # primary measured story: per-op profiler attribution (total XLA-op
        # time summed across the 8 device threads; sync bucket folded into
        # total but not into compute_only)
        for ny in (256, 512, 1024, 2048):
            n_it = iters if ny < 2048 else max(iters // 5, 10)
            tot, (r, c) = pb.breakdown(ny, n_it)
            ex, sy, co = (tot[k] / 1e6
                          for k in ("exchange", "sync", "compute"))
            total = ex + sy + co
            row = (f"profiled,cpu,{ny}x{ny},{r}x{c},{n_it},{total:.4f},"
                   f"{co:.4f},{ex:.4f},{100 * ex / total:.1f},0")
            print(row)
            out.write(row + "\n")
            out.flush()

        # analytic model for the hardware this environment cannot measure
        for ny, (r, c) in ((1024, (2, 4)), (4096, (2, 4)), (4096, (4, 4)),
                           (8192, (4, 4))):
            ici_b, hbm_b, t_ici, t_hbm, pct = model_row(ny, ny, r, c)
            row = (f"model,tpu-v5e-model,{ny}x{ny},{r}x{c},1,"
                   f"{t_ici + t_hbm:.2e},{t_hbm:.2e},{t_ici:.2e},{pct:.1f},0")
            print(row)
            out.write(row + "\n")

        # 3-D comm-avoiding path (parallel/pallas_sharded_3d): per K=2 steps
        # each z-shard exchanges 2 x K x 19 ghost (ny, nx) planes over ICI
        # while the local kernel advances at the measured ~2,700 MLUPS
        # (experiments/lbm3d-perf) — compute time, not HBM, is the
        # denominator because the kernel is at its roofline.
        K = 2
        for (nz, ny3, nx3), shards in (((64, 128, 256), 4),
                                       ((128, 256, 256), 8)):
            ici_b = 2 * K * 19 * ny3 * nx3 * 4
            t_ici = ici_b / (ICI_GBPS * 1e9)
            h = nz // shards
            t_cmp = K * h * ny3 * nx3 / 2.7e9
            pct = 100 * t_ici / (t_ici + t_cmp)
            row = (f"model3d,tpu-v5e-model,{nz}x{ny3}x{nx3},z{shards},{K},"
                   f"{t_ici + t_cmp:.2e},{t_cmp:.2e},{t_ici:.2e},{pct:.1f},0")
            print(row)
            out.write(row + "\n")
            # overlap=True (pallas_sharded_3d): the ghost transfer rides
            # under the interior kernel (h-2K of h planes); only the
            # residual max(0, t_ici - t_interior) is exposed
            t_int = K * (h - 2 * K) * ny3 * nx3 / 2.7e9
            t_exposed = max(0.0, t_ici - t_int)
            tot = t_cmp + t_exposed
            pct_o = 100 * t_exposed / tot
            row = (f"model3d-overlap,tpu-v5e-model,{nz}x{ny3}x{nx3},"
                   f"z{shards},{K},{tot:.2e},{t_cmp:.2e},{t_exposed:.2e},"
                   f"{pct_o:.1f},0")
            print(row)
            out.write(row + "\n")
        # 2-D comm-avoiding ghost-band path (parallel/pallas_sharded):
        # per K=4 steps each shard exchanges 8-row ghost bands (2 x 9
        # planes x 8 x w_ext) plus, on 2-D meshes, 128-col bands (2 x 9 x
        # (h) x 128) over ICI; the local in-place kernel advances K x h x w
        # cells at its measured ~12.0e9 cells/s (d2q9-overlap/results.csv).
        # overlap=True (make_overlap_chunk_fn, round 4) rides the ROW wave
        # under the interior kernel (h-16 of h rows); the column wave stays
        # exposed (the 2-wave corner scheme needs it before the row wave).
        K2 = 4
        RATE2 = 12.0e9
        for ny2, (r2, c2) in ((1024, (2, 4)), (1024, (8, 1)),
                              (4096, (4, 4)), (4096, (8, 1)),
                              (8192, (4, 4))):
            h2, w2 = ny2 // r2, ny2 // c2
            gcb = 2 * 9 * (h2) * 128 * 4 if c2 > 1 else 0
            w_ext = w2 + (256 if c2 > 1 else 0)
            grb = 2 * 9 * 8 * w_ext * 4
            t_row = grb / (ICI_GBPS * 1e9)
            t_col = gcb / (ICI_GBPS * 1e9)
            t_cmp = K2 * h2 * w2 / RATE2
            pct = 100 * (t_row + t_col) / (t_row + t_col + t_cmp)
            row = (f"model2d,tpu-v5e-model,{ny2}x{ny2},{r2}x{c2},{K2},"
                   f"{t_row + t_col + t_cmp:.2e},{t_cmp:.2e},"
                   f"{t_row + t_col:.2e},{pct:.1f},0")
            print(row)
            out.write(row + "\n")
            t_int = K2 * (h2 - 16) * w2 / RATE2
            t_exposed = max(0.0, t_row - t_int) + t_col
            tot = t_cmp + t_exposed
            pct_o = 100 * t_exposed / tot
            row = (f"model2d-overlap,tpu-v5e-model,{ny2}x{ny2},{r2}x{c2},"
                   f"{K2},{tot:.2e},{t_cmp:.2e},{t_exposed:.2e},"
                   f"{pct_o:.1f},0")
            print(row)
            out.write(row + "\n")
            # round-5 opt-in full2d scheme (scheme='full2d', shard width
            # >= 384): EVERY wave — row strips, column bands, and the 4
            # corner second hops (8x128 each) — rides under the
            # ghost-free interior kernel over (h-16)x(w-256) cells; only
            # max(0, t_all_waves - t_interior) is exposed. The price: the
            # W/E + S/N boundary kernels recompute a 3x halo-width strip
            # — extra work ~ (6*128*h + 6*8*w)/(h*w) of a pass, folded
            # into t_cmp2 as compute-side cost. The lane-width (128-col)
            # W/E strips make that LARGE (~80% at 1024^2 shards, ~44% at
            # 2048^2) — ~1.9x the column wave it hides at these working
            # figures, so full2d LOSES at every modelled shard and
            # overlap_scheme's 'auto' never picks it. The rows below are
            # the record of that negative; full2d stays opt-in for
            # interconnects >~2x slower per link.
            if c2 > 1 and w2 >= 384:
                t_corner = 2 * 4 * 9 * 8 * 128 * 4 / (ICI_GBPS * 1e9)
                t_int2 = K2 * (h2 - 16) * (w2 - 256) / RATE2
                reread = (6 * 128 * h2 + 6 * 8 * w2) / (h2 * w2)
                t_cmp2 = t_cmp * (1 + reread)
                t_exposed2 = max(0.0, t_row + t_col + t_corner - t_int2)
                tot2 = t_cmp2 + t_exposed2
                pct2 = 100 * t_exposed2 / tot2
                row = (f"model2d-overlap-full2d,tpu-v5e-model,{ny2}x{ny2},"
                       f"{r2}x{c2},{K2},{tot2:.2e},{t_cmp2:.2e},"
                       f"{t_exposed2:.2e},{pct2:.1f},0")
                print(row)
                out.write(row + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
