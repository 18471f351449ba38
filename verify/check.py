#!/usr/bin/env python3
"""Golden-file checker: compare av_vels / final_state outputs against reference.

Python-3 reimplementation of the reference's verification tool
(reference: check/check.py — Python 2.7). Same CLI, same comparison:
  * av_vels:      column 1 of `<step>:\t<value>` lines
  * final_state:  columns 0, 1 (coords, must match) and 5 of the
                  `x y u_x u_y u pressure obstacle` lines
  * failure when max percentage difference exceeds --tolerance (default 1%).

Exit status 0 on pass, 1 on fail.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def load_dat_files(av_vels_filename: str, final_state_filename: str):
    av_vels = np.loadtxt(av_vels_filename, usecols=[1], ndmin=1)
    final_state = np.loadtxt(final_state_filename, usecols=[0, 1, 5], ndmin=2)
    return av_vels, final_state


def diff_stats(ref_vals: np.ndarray, sim_vals: np.ndarray) -> dict:
    diff = ref_vals - sim_vals
    with np.errstate(divide="ignore", invalid="ignore"):
        diff_pcnt = 100.0 * (diff / (ref_vals - diff))
    max_i = int(np.argmax(np.abs(diff_pcnt)))
    return {
        "max_diff_step": max_i,
        "max_diff": diff[max_i],
        "max_diff_pcnt": diff_pcnt[max_i],
        "sim_val": sim_vals[max_i],
        "ref_val": ref_vals[max_i],
        "total": float(np.sum(np.abs(diff))),
    }


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="LBM output checker")
    parser.add_argument("--tolerance", nargs=1, default=[1.0], type=float,
                        help="percentage tolerance against reference results")
    parser.add_argument("--ref-av-vels-file", nargs=1, required=True)
    parser.add_argument("--ref-final-state-file", nargs=1, required=True)
    parser.add_argument("--av-vels-file", nargs=1, required=True)
    parser.add_argument("--final-state-file", nargs=1, required=True)
    args = parser.parse_args(argv)

    av_ref, fs_ref = load_dat_files(args.ref_av_vels_file[0], args.ref_final_state_file[0])
    av_sim, fs_sim = load_dat_files(args.av_vels_file[0], args.final_state_file[0])

    if np.any(fs_ref[:, 0:2] != fs_sim[:, 0:2]):
        print("Final state files coordinates were not the same")
        return 1
    if av_ref.size != av_sim.size:
        print("Different number of steps in av_vels files")
        return 1

    av_d = diff_stats(av_ref, av_sim)
    print(f"Total difference in av_vels : {av_d['total']:.12E}")
    print(f"Biggest difference (at step {av_d['max_diff_step']:d}) : {av_d['max_diff']:.12E}")
    print(f"  {av_d['sim_val']:.12E} vs. {av_d['ref_val']:.12E} = {av_d['max_diff_pcnt']:.2g}%")
    print()

    fs_d = diff_stats(fs_ref[:, 2], fs_sim[:, 2])
    jj = int(fs_sim[fs_d["max_diff_step"], 0])
    ii = int(fs_sim[fs_d["max_diff_step"], 1])
    print(f"Total difference in final_state : {fs_d['total']:.12E}")
    print(f"Biggest difference (at coord ({jj:d},{ii:d})) : {fs_d['max_diff']:.12E}")
    print(f"  {fs_d['sim_val']:.12E} vs. {fs_d['ref_val']:.12E} = {fs_d['max_diff_pcnt']:.2g}%")
    print()

    tol = args.tolerance[0]
    fs_failed = (not np.isfinite(fs_d["max_diff_pcnt"])) or abs(fs_d["max_diff_pcnt"]) > tol
    av_failed = (not np.isfinite(av_d["max_diff_pcnt"])) or abs(av_d["max_diff_pcnt"]) > tol
    if fs_failed:
        print("final state failed check")
    if av_failed:
        print("av_vels failed check")
    if fs_failed or av_failed:
        return 1
    print("Both tests passed!")
    return 0


if __name__ == "__main__":
    sys.exit(main())
