#!/usr/bin/env python3
"""Sharded-HLO collective audit: compile the full coupled step over an
N-device lon mesh (virtual CPU devices) and report every collective in the
optimized HLO — op counts and all-gather/all-reduce operand shapes.

This is the evidence artifact for the halo-bounded SPMD claim: the windowed
semi-Lagrangian advection reaches neighbors through jnp.roll (lowered by the
GSPMD partitioner to collective-permutes of one halo column), so no advected
stack may appear as an all-gather operand. Remaining all-gathers must only be
(a) the narrow polar exact-row band of the advection window and (b) flat
routing/renorm index plumbing, both O(rows · W), not O(H · W).

Usage:
  python -m scripts.analyze_sharding [--nlat 181] [--nlon 360] [--ndev 8]
"""

import argparse
import collections
import os
import re
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nlat", type=int, default=181)
    ap.add_argument("--nlon", type=int, default=360)
    ap.add_argument("--ndev", type=int, default=8)
    ap.add_argument("--steps", type=int, default=1)
    ap.add_argument("--dump", default=None, help="write full HLO text here")
    ap.add_argument("--env", action="append", default=[],
                    help="extra QD_* env overrides, NAME=VALUE (repeatable)")
    ap.add_argument("--time", action="store_true",
                    help="also time sharded vs single-device steps")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.ndev}"
        ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _build_world
    from qingdai_tpu import model as M
    from qingdai_tpu.parallel import mesh as pmesh

    extra = dict(kv.split("=", 1) for kv in args.env)
    mdl, state = _build_world(args.nlat, args.nlon, extra_env=extra or None)
    m = pmesh.make_mesh(args.ndev)
    mdl_s = pmesh.shard_model_statics(mdl, m)
    state_s = pmesh.shard_state(state, m, args.nlon)
    chunk = jax.jit(M.make_chunk_fn(mdl_s, args.steps))

    if args.time:
        import time
        st, _ = chunk(state_s)
        jax.block_until_ready(st)
        t0 = time.time()
        for _ in range(args.reps):
            st, _ = chunk(st)
        jax.block_until_ready(st)
        per_step_sharded = (time.time() - t0) / (args.reps * args.steps)

        chunk1 = jax.jit(M.make_chunk_fn(mdl, args.steps))
        st1, _ = chunk1(state)
        jax.block_until_ready(st1)
        t0 = time.time()
        for _ in range(args.reps):
            st1, _ = chunk1(st1)
        jax.block_until_ready(st1)
        per_step_single = (time.time() - t0) / (args.reps * args.steps)
        print(f"[timing] {args.nlat}x{args.nlon}: single-device "
              f"{per_step_single*1e3:.2f} ms/step, {args.ndev}-device sharded "
              f"{per_step_sharded*1e3:.2f} ms/step "
              f"(speedup {per_step_single/per_step_sharded:.2f}x on CPU "
              f"host cores — ICI-free lower bound)")

    compiled = chunk.lower(state_s).compile()
    hlo = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(hlo)

    ops = collections.Counter()
    ag_shapes = collections.Counter()
    ar_shapes = collections.Counter()
    cp_shapes = collections.Counter()
    for line in hlo.splitlines():
        s = line.strip()
        # the shape token may be a TUPLE with internal spaces when XLA's
        # collective combiner merges operands — e.g.
        #   %ar = (f32[45]{0}, f32[45]{0}) all-reduce(%a, %b)
        # a plain \S+ shape pattern silently skips those lines and the
        # audit undercounts combined collectives
        mo = re.match(r"(?:ROOT\s+)?%?[\w.\-]+\s*=\s*"
                      r"(\([^)]*\)|\S+)\s+(\S+)\(", s)
        if not mo:
            continue
        shape, op = mo.group(1), mo.group(2)
        if op.startswith(("all-gather", "all-reduce", "collective-permute",
                          "all-to-all", "reduce-scatter")):
            kind = op.split("(")[0].rstrip(".0123456789")
            ops[kind] += 1
            if kind.startswith("all-gather"):
                ag_shapes[shape] += 1
            elif kind.startswith("all-reduce"):
                ar_shapes[shape] += 1
            elif kind.startswith("collective-permute"):
                cp_shapes[shape] += 1

    print(f"grid {args.nlat}x{args.nlon}, {args.ndev}-device lon mesh, "
          f"{args.steps}-step chunk — collectives in optimized HLO:")
    for k, v in sorted(ops.items()):
        print(f"  {k:30s} {v}")
    for title, ctr in (("all-gather shapes", ag_shapes),
                       ("all-reduce shapes", ar_shapes),
                       ("collective-permute shapes", cp_shapes)):
        if ctr:
            print(f"  {title}:")
            for shp, n in sorted(ctr.items(), key=lambda kv: -kv[1]):
                print(f"    {n:4d} × {shp}")
    return ops


if __name__ == "__main__":
    main()
