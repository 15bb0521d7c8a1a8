#!/usr/bin/env python
"""Calibrate the Pallas backward kernel's scoped-VMEM footprint against
the REAL TPU compiler (AOT; no chip execution), because the analytic
budget model in pallas_composite._bwd_pref mispredicted: at
(pix=256, CL=128, L=6016) the compiler measured 16.62MB where the model
said ~9.5MB (campaign crash 2026-08-20, aroom iter 3859).

For each (tile_h, tile_w, chunk, gates) this lowers+compiles the
backward pallas_call at increasing L and reports the measured
scoped-VMEM size parsed from the compiler (success prints the boundary;
failures carry the size in the error text). Results feed the
pallas_composite._BWD_CAP_CALIBRATED table, keyed
(tile_pixels, need_dd, need_distribution).

Allocation is NON-monotonic in L, so a calibration entry requires the
exhaustive `--sweep` (every 128-multiple up to the boundary), not a
single boundary probe. The grid defaults to the realistic tile count
for the tile shape (tiny grids under-measure: scoped VMEM grows with
Mosaic's grid multi-buffering).

Usage:
  python tools/vmem_probe.py --tile 16x32 --gates none \
      --Ls 1280,1408,...          # probe specific depths
  python tools/vmem_probe.py --tile 16x32 --gates none --sweep 4096
                                  # every 128-multiple 128..4096
  python tools/vmem_probe.py --check   # verify the shipped table
                                  # against the current compiler
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


GATES = {
    "all": (True, True),
    "dd": (True, False),
    "dist": (False, True),
    "none": (False, False),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", default="16x16")
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--grid", type=int, default=0,
                    help="probe grid size (0 = realistic tile count "
                         "for a 320x240 image)")
    ap.add_argument("--gates", default="all", choices=sorted(GATES),
                    help="channel gates: all = need_dd+need_distribution "
                         "(eval/debug worst case), dd = dd only (train "
                         "step inside a dd window), none = train-step "
                         "defaults")
    ap.add_argument("--Ls", default="4096,4608,5120,5632,6016")
    ap.add_argument("--sweep", type=int, default=0, metavar="LMAX",
                    help="probe EVERY 128-multiple from 128 to LMAX "
                         "(the calibration-grade protocol)")
    ap.add_argument("--check", action="store_true",
                    help="verify every _BWD_CAP_CALIBRATED entry "
                         "compiles with the current toolchain (exit 1 "
                         "on a stale entry)")
    args = ap.parse_args()

    from gftorf_tpu.render.vmem_check import realistic_grid, try_compile_bwd

    if args.check:
        from gftorf_tpu.render.pallas_composite import _BWD_CAP_CALIBRATED

        stale = []
        for (pix, dd, dist), cap in sorted(_BWD_CAP_CALIBRATED.items()):
            # table keys are tile_pixels; probe at the shapes we ship
            th, tw = (16, pix // 16)
            ok, mb, msg = try_compile_bwd(th, tw, args.chunk, cap,
                                          T=args.grid, need_dd=dd,
                                          need_distribution=dist)
            size = f" vmem={mb}MB" if mb is not None else ""
            print(f"check pix={pix} dd={dd} dist={dist} cap={cap}: "
                  f"{'OK' if ok else 'STALE'}{size} "
                  f"{'' if ok else msg[:120]}", flush=True)
            if not ok:
                stale.append((pix, dd, dist, cap))
        if stale:
            print(f"STALE ENTRIES: {stale} — re-run --sweep and update "
                  "_BWD_CAP_CALIBRATED", flush=True)
            sys.exit(1)
        print("calibration table OK for this toolchain", flush=True)
        return

    th, tw = (int(v) for v in args.tile.split("x"))
    dd, dist = GATES[args.gates]
    if args.sweep:
        Ls = list(range(128, args.sweep + 1, 128))
    else:
        Ls = [int(v) for v in args.Ls.split(",")]
    T = args.grid or realistic_grid(th * tw)
    for L in Ls:
        ok, mb, msg = try_compile_bwd(th, tw, args.chunk, L, T=T,
                                      need_dd=dd, need_distribution=dist)
        size = f" vmem={mb}MB" if mb is not None else ""
        print(f"tile={th}x{tw} chunk={args.chunk} grid={T} "
              f"gates={args.gates} L={L}: "
              f"{'OK' if ok else 'OVERFLOW'}{size}  "
              f"{'' if ok else msg[:120]}", flush=True)


if __name__ == "__main__":
    main()
