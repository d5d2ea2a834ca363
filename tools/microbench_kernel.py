"""Microbenchmarks for the Pallas fitness-kernel redesign (round 2).

Times isolated pieces of the per-(patch,view) cell work on the real TPU to
decide the v2 kernel architecture:

  * matmul shape variants (per-particle serial vs particle-block batched)
  * pltpu.roll cost on the [KY, KX] box
  * bilinear weight-matrix build cost (the VPU term)
  * a full simulated v2 block body (roll + builds + matmul + reduce)

Run: PYTHONPATH=/root/.axon_site python tools/microbench_kernel.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KY, KX = 80, 256
KS = 64
T = 1024
P = 30
CELLS = 5120           # bench workload: B=1024 patches x C=5 views


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    float(jnp.sum(out))                      # compile + sync (axon rule)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out))
    dt = (time.time() - t0) / reps
    per_cell = dt / CELLS * 1e6
    per_part = per_cell / P
    print(f"{name:44s} {dt*1e3:8.2f} ms/call  {per_cell:7.3f} us/cell "
          f"{per_part:7.4f} us/particle", file=sys.stderr)
    return dt


def run_grid(body, extra_scratch=()):
    """pallas_call over (CELLS,) grid; each cell reads one box row block."""
    def kernel(box_ref, out_ref, *scratch):
        body(box_ref, out_ref, *scratch)

    box = jnp.asarray(np.random.rand(8, KY, KX), jnp.float32)
    f = pl.pallas_call(
        kernel,
        grid=(CELLS,),
        in_specs=[pl.BlockSpec((1, KY, KX), lambda i: (i % 8, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CELLS, 8, 128), jnp.float32),
        scratch_shapes=list(extra_scratch),
    )
    return jax.jit(lambda b: f(b)), box


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    # ---- A: current design: 30 x (roll + slice + [80,64]x[64,1024]) ----
    def body_a(box_ref, out_ref):
        box = box_ref[0]
        acc0 = jnp.zeros((8, 128), jnp.float32)

        def pp(p, acc):
            xoff = p % 17
            bp = pltpu.roll(box, -xoff, 1)[:, :KS].astype(jnp.bfloat16)
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (KS, 1), 0).astype(jnp.float32)
            u = 30.0 + 0.03 * jax.lax.broadcasted_iota(
                jnp.int32, (1, T), 1).astype(jnp.float32) + p
            rw = jnp.maximum(1.0 - jnp.abs(u - iota), 0.0)
            tmp = jax.lax.dot_general(
                bp, rw.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [KY, T]
            iy = jax.lax.broadcasted_iota(
                jnp.int32, (KY, 1), 0).astype(jnp.float32)
            v = 40.0 + 0.01 * jax.lax.broadcasted_iota(
                jnp.int32, (1, T), 1).astype(jnp.float32)
            cw = jnp.maximum(1.0 - jnp.abs(v - iy), 0.0)
            val = jnp.sum(tmp * cw, axis=0, keepdims=True)   # [1, T]
            return acc + val.reshape(8, 128)
        acc = jax.lax.fori_loop(0, P, pp, acc0)
        out_ref[0] = acc

    fa, box = run_grid(body_a)
    timeit("A current: 30x(roll+build+mm[80,64,1024])", fa, box)

    # ---- B: block-batched: 4 x (roll + builds + mm [80,64]x[64,8192]) ----
    PB, NB = 8, 4
    PT = PB * T

    def body_b(box_ref, out_ref):
        box = box_ref[0]
        acc0 = jnp.zeros((8, 128), jnp.float32)

        def blk(i, acc):
            bp = pltpu.roll(box, -(i % 17), 1)[:, :KS].astype(jnp.bfloat16)
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (KS, 1), 0).astype(jnp.float32)
            u = 30.0 + 0.003 * jax.lax.broadcasted_iota(
                jnp.int32, (1, PT), 1).astype(jnp.float32) + i
            rw = jnp.maximum(1.0 - jnp.abs(u - iota), 0.0)
            tmp = jax.lax.dot_general(
                bp, rw.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [KY, PT]
            iy = jax.lax.broadcasted_iota(
                jnp.int32, (KY, 1), 0).astype(jnp.float32)
            v = 40.0 + 0.001 * jax.lax.broadcasted_iota(
                jnp.int32, (1, PT), 1).astype(jnp.float32)
            cw = jnp.maximum(1.0 - jnp.abs(v - iy), 0.0)
            val = jnp.sum(tmp * cw, axis=0, keepdims=True)   # [1, PT]
            return acc + val.reshape(PB, T).sum(0).reshape(8, 128)
        acc = jax.lax.fori_loop(0, NB, blk, acc0)
        out_ref[0] = acc

    fb, _ = run_grid(body_b)
    timeit("B blocked: 4x(roll+build+mm[80,64,8192])", fb, box)

    # ---- C: KS=128 shared slice, no roll: 4 x mm [80,128]x[128,8192] ----
    def body_c(box_ref, out_ref):
        box = box_ref[0]
        bp = box[:, :128].astype(jnp.bfloat16)
        acc0 = jnp.zeros((8, 128), jnp.float32)

        def blk(i, acc):
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (128, 1), 0).astype(jnp.float32)
            u = 30.0 + 0.003 * jax.lax.broadcasted_iota(
                jnp.int32, (1, PT), 1).astype(jnp.float32) + i
            rw = jnp.maximum(1.0 - jnp.abs(u - iota), 0.0)
            tmp = jax.lax.dot_general(
                bp, rw.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            iy = jax.lax.broadcasted_iota(
                jnp.int32, (KY, 1), 0).astype(jnp.float32)
            v = 40.0 + 0.001 * jax.lax.broadcasted_iota(
                jnp.int32, (1, PT), 1).astype(jnp.float32)
            cw = jnp.maximum(1.0 - jnp.abs(v - iy), 0.0)
            val = jnp.sum(tmp * cw, axis=0, keepdims=True)
            return acc + val.reshape(PB, T).sum(0).reshape(8, 128)
        acc = jax.lax.fori_loop(0, NB, blk, acc0)
        out_ref[0] = acc

    fc, _ = run_grid(body_c)
    timeit("C shared: 4x(build+mm[80,128,8192])", fc, box)

    # ---- D: matmul only, per-particle shape ----
    def body_d(box_ref, out_ref):
        box = box_ref[0]
        bp = box[:, :KS].astype(jnp.bfloat16)
        rwf = box[:KS, :T // 2] * 0.001                        # junk weights

        def pp(p, acc):
            rw2 = pltpu.roll(rwf, p, 0).astype(jnp.bfloat16)  # defeat hoisting
            tmp = jax.lax.dot_general(
                bp, jnp.concatenate([rw2, rw2], 1),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc + tmp[:8, :128]
        acc = jax.lax.fori_loop(0, P, pp, jnp.zeros((8, 128), jnp.float32))
        out_ref[0] = acc

    fd, _ = run_grid(body_d)
    timeit("D mm only: 30x mm[80,64,1024]", fd, box)

    # ---- E: matmul only, blocked shape ----
    def body_e(box_ref, out_ref):
        box = box_ref[0]
        bp = box[:, :KS].astype(jnp.bfloat16)
        rwhf = box[:KS, :T // 2] * 0.001

        def blk(i, acc):
            rw2 = pltpu.roll(rwhf, i, 0).astype(jnp.bfloat16)
            rw = jnp.concatenate([rw2] * 16, 1)               # [64, 8192]
            tmp = jax.lax.dot_general(
                bp, rw, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc + tmp[:8, :128]
        acc = jax.lax.fori_loop(0, NB, blk, jnp.zeros((8, 128), jnp.float32))
        out_ref[0] = acc

    fe, _ = run_grid(body_e)
    timeit("E mm only: 4x mm[80,64,8192]", fe, box)

    # ---- F: rolls only ----
    def body_f(box_ref, out_ref):
        box = box_ref[0]

        def pp(p, acc):
            return acc + pltpu.roll(box, -(p % 17), 1)[:8, :128]
        acc = jax.lax.fori_loop(0, P, pp, jnp.zeros((8, 128), jnp.float32))
        out_ref[0] = acc

    ff, _ = run_grid(body_f)
    timeit("F rolls only: 30x roll[80,256]", ff, box)

    # ---- G: weight builds only, blocked ----
    def body_g(box_ref, out_ref):
        def blk(i, acc):
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (KS, 1), 0).astype(jnp.float32)
            u = 30.0 + 0.003 * jax.lax.broadcasted_iota(
                jnp.int32, (1, PT), 1).astype(jnp.float32) + i
            rw = jnp.maximum(1.0 - jnp.abs(u - iota), 0.0)
            iy = jax.lax.broadcasted_iota(
                jnp.int32, (KY, 1), 0).astype(jnp.float32)
            v = 40.0 + 0.001 * jax.lax.broadcasted_iota(
                jnp.int32, (1, PT), 1).astype(jnp.float32) + i
            cw = jnp.maximum(1.0 - jnp.abs(v - iy), 0.0)
            return (acc + rw[:8, :128] + cw[:8, :128])
        acc = jax.lax.fori_loop(0, NB, blk, jnp.zeros((8, 128), jnp.float32))
        out_ref[0] = acc

    fg, _ = run_grid(body_g)
    timeit("G builds only: 4x(rw[64,8192]+cw[80,8192])", fg, box)

    # ---- H: stage-2 reduce only ----
    def body_h(box_ref, out_ref):
        box = box_ref[0]
        tmp = jnp.concatenate([box[:, :T // 8]] * 8, 1) * 0.01  # [80, 1024]

        def blk(i, acc):
            cw = pltpu.roll(tmp, i, 0)
            val = jnp.sum(tmp * cw, axis=0, keepdims=True)
            return acc + val.reshape(8, 128)
        acc = jax.lax.fori_loop(0, NB * PB, blk,
                                jnp.zeros((8, 128), jnp.float32))
        out_ref[0] = acc

    fh, _ = run_grid(body_h)
    timeit("H reduce only: 32x (mul+sum over [80,1024])", fh, box)

    # ---- I: full v2 body: 4 x (1 roll + builds + flipped mm + reduce) ----
    def body_i(box_ref, out_ref):
        box = box_ref[0]
        acc0 = jnp.zeros((8, 128), jnp.float32)

        def blk(i, acc):
            bp = pltpu.roll(box, -(i % 17), 1)[:, :KS].astype(jnp.bfloat16)
            iy = jax.lax.broadcasted_iota(
                jnp.int32, (KY, 1), 0).astype(jnp.float32)
            v = 40.0 + 0.001 * jax.lax.broadcasted_iota(
                jnp.int32, (1, PT), 1).astype(jnp.float32)
            cw = jnp.maximum(1.0 - jnp.abs(v - iy), 0.0)
            # flipped: contract the KY axis on the MXU -> S [KS, PT]
            S = jax.lax.dot_general(
                bp, cw.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (KS, 1), 0).astype(jnp.float32)
            u = 30.0 + 0.003 * jax.lax.broadcasted_iota(
                jnp.int32, (1, PT), 1).astype(jnp.float32) + i
            rw = jnp.maximum(1.0 - jnp.abs(u - iota), 0.0)
            val = jnp.sum(S * rw, axis=0, keepdims=True)      # over KS=64
            return acc + val.reshape(PB, T).sum(0).reshape(8, 128)
        acc = jax.lax.fori_loop(0, NB, blk, acc0)
        out_ref[0] = acc

    fi, _ = run_grid(body_i)
    timeit("I v2 flip: 4x(roll+builds+mmT[80k,64,8192]+red64)", fi, box)

    # ---- J: mm only, K=96 / K=128 contraction width ----
    for kk in (96, 128):
        def body_j(box_ref, out_ref, kk=kk):
            box = box_ref[0]
            bp = box[:, :kk].astype(jnp.bfloat16)

            def blk(i, acc):
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (kk, 1), 0).astype(jnp.float32)
                u = 30.0 + 0.003 * jax.lax.broadcasted_iota(
                    jnp.int32, (1, PT), 1).astype(jnp.float32) + i
                rw = jnp.maximum(1.0 - jnp.abs(u - iota),
                                 0.0).astype(jnp.bfloat16)
                tmp = jax.lax.dot_general(
                    bp, rw, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return acc + tmp[:8, :128]
            acc = jax.lax.fori_loop(0, NB, blk,
                                    jnp.zeros((8, 128), jnp.float32))
            out_ref[0] = acc

        fj, _ = run_grid(body_j)
        timeit(f"J mm only: 4x mm[80,{kk},8192]", fj, box)

    # ---- L: v2 body with UNROLLED static block loop (scheduler overlap) --
    def body_l(box_ref, out_ref):
        box = box_ref[0]
        acc = jnp.zeros((8, 128), jnp.float32)
        for i in range(NB):
            bp = pltpu.roll(box, (KX - i % 17) % KX,
                            1)[:, :KS].astype(jnp.bfloat16)
            iy = jax.lax.broadcasted_iota(
                jnp.int32, (KY, 1), 0).astype(jnp.float32)
            v = 40.0 + 0.001 * jax.lax.broadcasted_iota(
                jnp.int32, (1, PT), 1).astype(jnp.float32)
            cw = jnp.maximum(1.0 - jnp.abs(v - iy), 0.0)
            S = jax.lax.dot_general(
                bp, cw.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (KS, 1), 0).astype(jnp.float32)
            u = 30.0 + 0.003 * jax.lax.broadcasted_iota(
                jnp.int32, (1, PT), 1).astype(jnp.float32) + i
            rw = jnp.maximum(1.0 - jnp.abs(u - iota), 0.0)
            val = jnp.sum(S * rw, axis=0, keepdims=True)
            acc = acc + val.reshape(PB, T).sum(0).reshape(8, 128)
        out_ref[0] = acc

    fl, _ = run_grid(body_l)
    timeit("L v2 unrolled: same as I, static loop", fl, box)

    # ---- M: unrolled variants: KS width x (PB, NB) blocking ----
    for ks, pb, nb in ((96, 8, 4), (64, 10, 3), (96, 10, 3), (128, 10, 3)):
        pt = pb * T

        def body_m(box_ref, out_ref, ks=ks, pb=pb, nb=nb, pt=pt):
            box = box_ref[0]
            acc = jnp.zeros((8, 128), jnp.float32)
            for i in range(nb):
                bp = pltpu.roll(box, (KX - i % 17) % KX,
                                1)[:, :ks].astype(jnp.bfloat16)
                iy = jax.lax.broadcasted_iota(
                    jnp.int32, (KY, 1), 0).astype(jnp.float32)
                v = 40.0 + 0.001 * jax.lax.broadcasted_iota(
                    jnp.int32, (1, pt), 1).astype(jnp.float32)
                cw = jnp.maximum(1.0 - jnp.abs(v - iy), 0.0)
                S = jax.lax.dot_general(
                    bp, cw.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (ks, 1), 0).astype(jnp.float32)
                u = 30.0 + 0.003 * jax.lax.broadcasted_iota(
                    jnp.int32, (1, pt), 1).astype(jnp.float32) + i
                rw = jnp.maximum(1.0 - jnp.abs(u - iota), 0.0)
                val = jnp.sum(S * rw, axis=0, keepdims=True)
                acc = acc + val.reshape(pb, T).sum(0).reshape(8, 128)
            out_ref[0] = acc

        fm, _ = run_grid(body_m)
        timeit(f"M v2 unrolled KS={ks} PB={pb} NB={nb}", fm, box)

    # ---- N: SHIPPED wide body: KS=128 contract_x, reduce over KY=80 ----
    # (what _bilinear_block picks for KS >= KY; baseline for O/P/Q)
    def make_wide(reduce_mm=False, bf16_build=False):
        def body(box_ref, out_ref):
            box = box_ref[0]
            acc = jnp.zeros((8, 128), jnp.float32)
            ones = jnp.ones((1, KY), jnp.bfloat16)
            for i in range(NB):
                bp = pltpu.roll(box, (KX - i % 17) % KX,
                                1)[:, :128].astype(jnp.bfloat16)
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (128, 1), 0).astype(jnp.float32)
                u = 30.0 + 0.003 * jax.lax.broadcasted_iota(
                    jnp.int32, (1, PT), 1).astype(jnp.float32) + i
                if bf16_build:
                    d = (u - iota).astype(jnp.bfloat16)
                    rw = jnp.maximum(1.0 - jnp.abs(d), 0.0)
                else:
                    rw = jnp.maximum(1.0 - jnp.abs(u - iota),
                                     0.0).astype(jnp.bfloat16)
                tmp = jax.lax.dot_general(
                    bp, rw, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)       # [KY, PT]
                iy = jax.lax.broadcasted_iota(
                    jnp.int32, (KY, 1), 0).astype(jnp.float32)
                v = 40.0 + 0.001 * jax.lax.broadcasted_iota(
                    jnp.int32, (1, PT), 1).astype(jnp.float32)
                cw = jnp.maximum(1.0 - jnp.abs(v - iy), 0.0)
                if reduce_mm:
                    prod = (tmp * cw).astype(jnp.bfloat16)
                    val = jax.lax.dot_general(
                        ones, prod, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)   # [1, PT]
                else:
                    val = jnp.sum(tmp * cw, axis=0, keepdims=True)
                acc = acc + val.reshape(PB, T).sum(0).reshape(8, 128)
            out_ref[0] = acc
        return body

    fn, _ = run_grid(make_wide())
    timeit("N SHIPPED wide: KS=128 ctr_x red80", fn, box)

    fo, _ = run_grid(make_wide(reduce_mm=True))
    timeit("O wide + ones-matmul reduce", fo, box)

    fp, _ = run_grid(make_wide(bf16_build=False, reduce_mm=False))
    # Q: bf16 build of rw (post-subtract cast; weights exact in [0,1])
    fq, _ = run_grid(make_wide(bf16_build=True))
    timeit("Q wide + bf16 rw build", fq, box)

    # ---- R: wide body, SHARED box slice across blocks (roll hoisted) ----
    # All PB-blocks of one cell share one 128-wide slice centered on the
    # whole-patch mean (roll once per cell instead of per block).
    def body_r(box_ref, out_ref):
        box = box_ref[0]
        bp0 = pltpu.roll(box, 3, 1)[:, :128].astype(jnp.bfloat16)
        acc = jnp.zeros((8, 128), jnp.float32)
        for i in range(NB):
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (128, 1), 0).astype(jnp.float32)
            u = 30.0 + 0.003 * jax.lax.broadcasted_iota(
                jnp.int32, (1, PT), 1).astype(jnp.float32) + i
            rw = jnp.maximum(1.0 - jnp.abs(u - iota),
                             0.0).astype(jnp.bfloat16)
            tmp = jax.lax.dot_general(
                bp0, rw, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            iy = jax.lax.broadcasted_iota(
                jnp.int32, (KY, 1), 0).astype(jnp.float32)
            v = 40.0 + 0.001 * jax.lax.broadcasted_iota(
                jnp.int32, (1, PT), 1).astype(jnp.float32)
            cw = jnp.maximum(1.0 - jnp.abs(v - iy), 0.0)
            val = jnp.sum(tmp * cw, axis=0, keepdims=True)
            acc = acc + val.reshape(PB, T).sum(0).reshape(8, 128)
        out_ref[0] = acc

    fr, _ = run_grid(body_r)
    timeit("R wide, roll hoisted (1/cell)", fr, box)

    # ---- S: NO roll at all — contract the FULL KX=256 box (2 K-tiles) --
    # Alignment lives entirely in the hat weights (built over all 256
    # lanes), so the dynamic lane-roll disappears; the price is a second
    # MXU K-tile (J: K=128 costs 2.48 us/cell) and a 256-row rw build.
    def body_s(box_ref, out_ref):
        box = box_ref[0]
        bp = box.astype(jnp.bfloat16)                          # [80, 256]
        acc = jnp.zeros((8, 128), jnp.float32)
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (KX, 1), 0).astype(jnp.float32)
        iy = jax.lax.broadcasted_iota(
            jnp.int32, (KY, 1), 0).astype(jnp.float32)
        for i in range(NB):
            u = 94.0 + 0.003 * jax.lax.broadcasted_iota(
                jnp.int32, (1, PT), 1).astype(jnp.float32) + i
            rw = jnp.maximum(1.0 - jnp.abs(u - iota),
                             0.0).astype(jnp.bfloat16)        # [256, PT]
            tmp = jax.lax.dot_general(
                bp, rw, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [KY, PT]
            v = 40.0 + 0.001 * jax.lax.broadcasted_iota(
                jnp.int32, (1, PT), 1).astype(jnp.float32)
            cw = jnp.maximum(1.0 - jnp.abs(v - iy), 0.0)
            val = jnp.sum(tmp * cw, axis=0, keepdims=True)
            acc = acc + val.reshape(PB, T).sum(0).reshape(8, 128)
        out_ref[0] = acc

    fs, _ = run_grid(body_s)
    timeit("S no-roll: full-K mm[80,256,8192]", fs, box)

    # ---- T: NO roll, split-K — two static 128-column slices, each with
    # its own hat half, summed (same math as S, explicit 2-tile schedule;
    # the second tile's rw build can be skipped when the footprint
    # provably fits one half, which a production kernel would know from
    # the box-placement margin)
    def body_t(box_ref, out_ref):
        box = box_ref[0]
        bp0 = box[:, :128].astype(jnp.bfloat16)
        bp1 = box[:, 128:].astype(jnp.bfloat16)
        acc = jnp.zeros((8, 128), jnp.float32)
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (128, 1), 0).astype(jnp.float32)
        iy = jax.lax.broadcasted_iota(
            jnp.int32, (KY, 1), 0).astype(jnp.float32)
        for i in range(NB):
            u = 94.0 + 0.003 * jax.lax.broadcasted_iota(
                jnp.int32, (1, PT), 1).astype(jnp.float32) + i
            rw0 = jnp.maximum(1.0 - jnp.abs(u - iota),
                              0.0).astype(jnp.bfloat16)
            rw1 = jnp.maximum(1.0 - jnp.abs((u - 128.0) - iota),
                              0.0).astype(jnp.bfloat16)
            tmp = jax.lax.dot_general(
                bp0, rw0, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            tmp = tmp + jax.lax.dot_general(
                bp1, rw1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            v = 40.0 + 0.001 * jax.lax.broadcasted_iota(
                jnp.int32, (1, PT), 1).astype(jnp.float32)
            cw = jnp.maximum(1.0 - jnp.abs(v - iy), 0.0)
            val = jnp.sum(tmp * cw, axis=0, keepdims=True)
            acc = acc + val.reshape(PB, T).sum(0).reshape(8, 128)
        out_ref[0] = acc

    ft, _ = run_grid(body_t)
    timeit("T no-roll: split-K 2x mm[80,128,8192]", ft, box)

    # ---- V: VPU rate calibration: weight build ONLY, f32 vs bf16 ----
    # (decides whether bf16 doubles the VPU element rate on this chip;
    # if yes, building rw/cw in bf16 halves the dominant kernel term)
    def make_build_only(dt):
        def body(box_ref, out_ref):
            acc = jnp.zeros((8, 128), jnp.float32)
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (128, 1), 0).astype(dt)
            for i in range(NB):
                u = (30.0 + 0.003 * jax.lax.broadcasted_iota(
                    jnp.int32, (1, PT), 1).astype(jnp.float32)
                    + i).astype(dt)
                rw = jnp.maximum(1.0 - jnp.abs(u - iota), 0.0)
                acc = acc + jnp.sum(
                    rw.astype(jnp.float32).reshape(128, PB, T),
                    axis=(0, 1))[None, :].reshape(8, 128)
            out_ref[0] = acc
        return body

    fv1, _ = run_grid(make_build_only(jnp.float32))
    timeit("V1 rw[128,PT] build only, f32", fv1, box)
    fv2, _ = run_grid(make_build_only(jnp.bfloat16))
    timeit("V2 rw[128,PT] build only, bf16", fv2, box)

    # ---- W: wide body, ALL post-matmul VPU work in bf16 ----
    # (rw build bf16, cw build bf16, tmp cast bf16, multiply+reduce bf16;
    # the f32 accumulate happens on the [8, 128] output only)
    def body_w(box_ref, out_ref):
        box = box_ref[0]
        acc = jnp.zeros((8, 128), jnp.float32)
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (128, 1), 0).astype(jnp.bfloat16)
        iy = jax.lax.broadcasted_iota(
            jnp.int32, (KY, 1), 0).astype(jnp.bfloat16)
        for i in range(NB):
            bp = pltpu.roll(box, (KX - i % 17) % KX,
                            1)[:, :128].astype(jnp.bfloat16)
            u = (30.0 + 0.003 * jax.lax.broadcasted_iota(
                jnp.int32, (1, PT), 1).astype(jnp.float32)
                + i).astype(jnp.bfloat16)
            rw = jnp.maximum(1.0 - jnp.abs(u - iota), 0.0)
            # Mosaic requires a 32-bit matmul accumulator on real TPU;
            # downcast AFTER the dot (same as the production kernel)
            tmp = jax.lax.dot_general(
                bp, rw, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)                            # [KY, PT]
            v = (40.0 + 0.001 * jax.lax.broadcasted_iota(
                jnp.int32, (1, PT), 1).astype(jnp.float32)).astype(
                    jnp.bfloat16)
            cw = jnp.maximum(1.0 - jnp.abs(v - iy), 0.0)
            # sum in bf16, cast the result — exactly _bilinear_block's
            # vpu_bf16 reduce (pallas_fitness.py), not a heavier f32 reduce
            val = jnp.sum(tmp * cw, axis=0,
                          keepdims=True).astype(jnp.float32)
            acc = acc + val.reshape(PB, T).sum(0).reshape(8, 128)
        out_ref[0] = acc

    fw, _ = run_grid(body_w)
    timeit("W wide, all-bf16 VPU path", fw, box)


if __name__ == "__main__":
    main()
