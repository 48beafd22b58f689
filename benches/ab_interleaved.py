#!/usr/bin/env python
"""Drift-cancelling A/B for the fused flagship.

benches/ab_firfold.py times each variant sequentially inside one
process; that cancels PROCESS-level tunnel jitter (~13%) but not the
minutes-scale drift WITHIN a process, which measured large enough to
rank `no master limiter` slower than `with limiter` (impossible).

This harness builds every variant first, warms them, then times them in
ROUND-ROBIN order (A B C A B C ...) taking per-variant minima, so slow
drift hits all variants equally. Differential (R2 vs R1 in-jit
repetitions) per bench.py methodology.

Env: AB_ONLY=name,name  AB_STREAMS  AB_BLOCK  AB_BLOCKS  AB_ROUNDS  AB_AGC
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rodio_tpu.utils.platform import select_platform

select_platform(os.environ.get("RODIO_TPU_PLATFORM", "axon"))


def make_run(node, state, T, n_blocks, repeat):
    def body(s, _):
        s, out, v = node.emit(s, T)
        return s, (jnp.sum(out * out), jnp.sum(v))

    def render_once(s):
        _, (energy, valid) = jax.lax.scan(body, s, None, length=n_blocks)
        return jnp.sum(energy), jnp.sum(valid)

    @jax.jit
    def run(s0):
        leaves, treedef = jax.tree_util.tree_flatten(s0)
        i_f = next(i for i, l in enumerate(leaves)
                   if jnp.issubdtype(l.dtype, jnp.floating))

        def outer(_, acc):
            e_prev, _v = acc
            lv = list(leaves)
            lv[i_f] = lv[i_f] + (e_prev * 0.0).astype(lv[i_f].dtype)
            return render_once(jax.tree_util.tree_unflatten(treedef, lv))

        return jax.lax.fori_loop(
            0, repeat, outer, (jnp.float32(0.0), jnp.int32(0))
        )

    return lambda: run(state)


def main():
    from rodio_tpu.flagship import make_flagship
    from rodio_tpu.io.wav import read_wav

    n_streams = int(os.environ.get("AB_STREAMS", "512"))
    T = int(os.environ.get("AB_BLOCK", "4160"))
    n_blocks = int(os.environ.get("AB_BLOCKS", "40"))
    rounds = int(os.environ.get("AB_ROUNDS", "6"))
    with_agc = os.environ.get("AB_AGC", "0") == "1"
    r1, r2 = 1, 6
    seconds = (n_blocks * T / 48000.0) * (44100 / 48000.0) + 1.0
    pcm = None
    try:
        pcm, _ = read_wav("/root/reference/assets/music.wav")
    except Exception:
        pass

    catalog = [
        ("la4", dict(firfold=False, lookahead=4)),
        ("la4-seplimit", dict(firfold=False, lookahead=4,
                              inkernel_limit=False)),
        ("la4-nolimit", dict(firfold=False, lookahead=4,
                             inkernel_limit=False, _unwrap=True)),
        ("la8", dict(firfold=False, lookahead=8)),
        ("la2", dict(firfold=False, lookahead=2)),
        ("la4-int2", dict(firfold=False, lookahead=4, precision="int2")),
        ("la4-m3", dict(firfold=False, lookahead=4, m=3, _T=4800)),
        ("la4-ringf32", dict(firfold=False, lookahead=4, agc_ring="f32")),
        # group-rate AGC (opt-in relaxed-smoother contract; AB_AGC=1)
        ("la4-g4", dict(firfold=False, lookahead=4, agc_group=4)),
        ("la4-g8", dict(firfold=False, lookahead=4, agc_group=8)),
        ("la4-g16", dict(firfold=False, lookahead=4, agc_group=16)),
        ("la4-g32", dict(firfold=False, lookahead=4, agc_group=32)),
        # chunk-DMA pipeline depth (default 3)
        ("la4-d4", dict(firfold=False, lookahead=4, dma_depth=4)),
        ("la4-d5", dict(firfold=False, lookahead=4, dma_depth=5)),
        ("la4-g16d4", dict(firfold=False, lookahead=4, agc_group=16,
                           dma_depth=4)),
        # int2 halves the piece count, freeing VMEM for m=3 (int3+m3
        # exceeds the 16MB scoped-VMEM limit)
        ("la4-int2m3", dict(firfold=False, lookahead=4, precision="int2",
                            m=3, _T=4800, dma_depth=3)),
        ("la4-int2T48", dict(firfold=False, lookahead=4,
                             precision="int2", _T=4800)),
        ("la4-T48", dict(firfold=False, lookahead=4, _T=4800)),
        ("la4-int2m3g16", dict(firfold=False, lookahead=4,
                               precision="int2", m=3, _T=4800,
                               dma_depth=3, agc_group=16)),
        # negative lookahead = STATICALLY UNROLLED serial loop (every
        # x_scr/y_scr row access a static VMEM address)
        ("u4", dict(firfold=False, lookahead=-4)),
        ("u8", dict(firfold=False, lookahead=-8)),
        ("u4-int2m3", dict(firfold=False, lookahead=-4, precision="int2",
                           m=3, _T=4800, dma_depth=3)),
        ("u8-int2m3", dict(firfold=False, lookahead=-8, precision="int2",
                           m=3, _T=4800, dma_depth=3)),
        ("u12-int2m3", dict(firfold=False, lookahead=-12,
                            precision="int2", m=3, _T=4800, dma_depth=3)),
        ("u16-int2m3", dict(firfold=False, lookahead=-16,
                            precision="int2", m=3, _T=4800, dma_depth=3)),
        ("u8-int2", dict(firfold=False, lookahead=-8, precision="int2",
                         _T=4800)),
        ("u4-T48", dict(firfold=False, lookahead=-4, _T=4800)),
        ("u8-T48", dict(firfold=False, lookahead=-8, _T=4800)),
        ("u4-g16", dict(firfold=False, lookahead=-4, agc_group=16)),
        ("u4-int2m3g16", dict(firfold=False, lookahead=-4,
                              precision="int2", m=3, _T=4800,
                              dma_depth=3, agc_group=16)),
        # int3/m2 default-config sweep at T=4800+: wider unrolls, DMA
        # depth, larger blocks (more grid steps amortize fixed cost)
        ("u16-T48", dict(firfold=False, lookahead=-16, _T=4800)),
        ("u32-T48", dict(firfold=False, lookahead=-32, _T=4800)),
        ("u8-T48d3", dict(firfold=False, lookahead=-8, _T=4800,
                          dma_depth=3)),
        ("u8-T48d5", dict(firfold=False, lookahead=-8, _T=4800,
                          dma_depth=5)),
        ("u8-T64", dict(firfold=False, lookahead=-8, _T=6400)),
        ("u8-T80", dict(firfold=False, lookahead=-8, _T=8000)),
        # speed-record config at larger blocks (mto=480: T multiple)
        ("u4-int2m3T72", dict(firfold=False, lookahead=-4,
                              precision="int2", m=3, _T=7200,
                              dma_depth=3)),
        ("u4-int2m3T96", dict(firfold=False, lookahead=-4,
                              precision="int2", m=3, _T=9600,
                              dma_depth=3, _MB=9600)),
        # gain_post: per-lane gains as an in-kernel vector multiply on
        # the resample output (raw chunks -> int2 lossless for the
        # 16-bit music.wav content) vs the init-time PCM fold
        ("u4-int2m3-gp", dict(firfold=False, lookahead=-4,
                              precision="int2", gain_post=True, m=3,
                              _T=4800, dma_depth=3)),
        ("u4-int2m3-fold", dict(firfold=False, lookahead=-4,
                                precision="int2", gain_post=False, m=3,
                                _T=4800, dma_depth=3)),
        ("u8-int2-gp", dict(firfold=False, lookahead=-8,
                            precision="int2", gain_post=True, _T=4800)),
        # the full new default resolution (auto precision probe + auto
        # m/dma/lookahead): what `python bench.py` now runs
        ("autodefault", dict(_T=4800)),
        # ufir: FIR as 3 vector passes + the u-form 2-term IIR loop
        # (firfold's cheap loop without its 3x-stacked weight dot)
        ("u4-ufir", dict(firfold=False, lookahead=-4, ufir=True,
                         _T=4800)),
        ("u8-ufir", dict(firfold=False, lookahead=-8, ufir=True,
                         _T=4800)),
        ("u4-int2m3-ufir", dict(firfold=False, lookahead=-4, ufir=True,
                                precision="int2", m=3, _T=4800,
                                dma_depth=3)),
        ("u8-int2m3-ufir", dict(firfold=False, lookahead=-8, ufir=True,
                                precision="int2", m=3, _T=4800,
                                dma_depth=3)),
        ("u4-ufir-g16", dict(firfold=False, lookahead=-4, ufir=True,
                             agc_group=16, _T=4800)),
        # rel0 AGC plan (EXACT for the default release_time=0: peak
        # detector memoryless, smoother as clamped-min) vs the 3-chain
        # serial plan — AB_AGC=1 (round-4, VERDICT r3 ask #4)
        ("u4-agc-serial", dict(firfold=False, lookahead=-4,
                               agc_plan="serial")),
        ("u4-agc-rel0", dict(firfold=False, lookahead=-4,
                             agc_plan="rel0")),
        ("la4-agc-serial", dict(firfold=False, lookahead=4,
                                agc_plan="serial")),
        ("la4-agc-rel0", dict(firfold=False, lookahead=4,
                              agc_plan="rel0")),
        ("u4-int2m3-rel0", dict(firfold=False, lookahead=-4,
                                precision="int2", m=3, _T=4800,
                                dma_depth=3, agc_plan="rel0")),
        # i8 byte-piece chunks (round-4): int8 hi/lo pieces at HALF
        # int2's chunk DMA bytes for 16-bit-grid content (music.wav
        # qualifies); the halved xraw scratch also frees VMEM for m=4
        ("u4-i8m3", dict(firfold=False, lookahead=-4, precision="i8",
                         m=3, _T=4800, dma_depth=3)),
        ("u4-i8m3d4", dict(firfold=False, lookahead=-4, precision="i8",
                           m=3, _T=4800, dma_depth=4)),
        ("u4-i8m4", dict(firfold=False, lookahead=-4, precision="i8",
                         m=4, _T=5120, dma_depth=3)),
        ("u4-i8m3d5", dict(firfold=False, lookahead=-4, precision="i8",
                           m=3, _T=4800, dma_depth=5)),
        ("u4-i8m4d4", dict(firfold=False, lookahead=-4, precision="i8",
                           m=4, _T=5120, dma_depth=4)),
        ("u8-i8m3d4", dict(firfold=False, lookahead=-8, precision="i8",
                           m=3, _T=4800, dma_depth=4)),
        ("u4-i8m3T72", dict(firfold=False, lookahead=-4, precision="i8",
                            m=3, _T=7200, dma_depth=4)),
        ("u4-i8m4T76", dict(firfold=False, lookahead=-4, precision="i8",
                            m=4, _T=7680, dma_depth=4)),
        ("u4-i8m4T102", dict(firfold=False, lookahead=-4, precision="i8",
                             m=4, _T=10240, dma_depth=4, _MB=10240)),
        ("u8-i8m4T76", dict(firfold=False, lookahead=-8, precision="i8",
                            m=4, _T=7680, dma_depth=4)),
        ("u4-i8m4T76d3", dict(firfold=False, lookahead=-4,
                              precision="i8", m=4, _T=7680, dma_depth=3)),
        # round-5 T ladder past 7680 (VERDICT r4 ask #8): buffers now
        # take pad_frames from max_block, lifting the PAD_FRAMES=8192
        # ceiling that stopped the round-4 sweep at T=10240
        ("u4-i8m4T76d5", dict(firfold=False, lookahead=-4,
                              precision="i8", m=4, _T=7680, dma_depth=5)),
        ("u4-i8m4T96d5", dict(firfold=False, lookahead=-4,
                              precision="i8", m=4, _T=9600,
                              _MB=9600, dma_depth=5)),
        ("u4-i8m4T115d5", dict(firfold=False, lookahead=-4,
                               precision="i8", m=4, _T=11520,
                               _MB=11520, dma_depth=5)),
        ("u4-i8m4T128d5", dict(firfold=False, lookahead=-4,
                               precision="i8", m=4, _T=12800,
                               _MB=12800, dma_depth=5)),
        ("u4-i8m4T154d5", dict(firfold=False, lookahead=-4,
                               precision="i8", m=4, _T=15360,
                               _MB=15360, dma_depth=5)),
        # round-5 content classes at the ladder shapes: the i24 3-byte
        # layout (24-bit masters) and int2 (float masters) rails
        ("u4-i24m3T76", dict(firfold=False, lookahead=-4,
                             precision="i24", m=3, _T=7680, dma_depth=3,
                             _content="grid24")),
        ("u4-int2m3T76", dict(firfold=False, lookahead=-4,
                              precision="int2", m=3, _T=7680,
                              dma_depth=3)),
        # the i24 layout's fair rival ON 24-bit content: forced int3
        # (the arbitrary-content <=1e-6 contract) at its auto m=2
        ("u4-int3m2T76-g24", dict(firfold=False, lookahead=-4,
                                  precision="int3", m=2, _T=7680,
                                  dma_depth=4, _content="grid24")),
        # i8 under the in-kernel AGC (AB_AGC=1): chunk DMA halves but
        # the AGC serial chains + sq ring dominate — measure the delta
        ("u4-agc-rel0-int2", dict(firfold=False, lookahead=-4,
                                  agc_plan="rel0", precision="int2")),
        ("u4-agc-rel0-i8", dict(firfold=False, lookahead=-4,
                                agc_plan="rel0", precision="i8")),
        ("u4-agc-rel0-i8T76", dict(firfold=False, lookahead=-4,
                                   agc_plan="rel0", precision="i8",
                                   _T=7680)),
        ("u4-agc-rel0-int2T76", dict(firfold=False, lookahead=-4,
                                     agc_plan="rel0", precision="int2",
                                     _T=7680)),
        # round-5 rel0 plan ladder (AB_AGC=1): rel0f = lean rel0
        # (packed ring + folded-rsqrt desired gain); rel0b = blocked
        # parallel-in-time smoother (VERDICT r4 ask #1 measurement).
        # rel0b runs at int2/m2 (mto=320): its 3 extra [mto,8,128] f32
        # trans scratches exceed scoped VMEM at i8/m4 (mto=640).
        ("u4-agc-rel0f-i8T76", dict(firfold=False, lookahead=-4,
                                    agc_plan="rel0f", precision="i8",
                                    _T=7680)),
        ("u4-agc-rel0f-int2T76", dict(firfold=False, lookahead=-4,
                                      agc_plan="rel0f",
                                      precision="int2", _T=7680)),
        ("u4-agc-rel0b-int2T76", dict(firfold=False, lookahead=-4,
                                      agc_plan="rel0b",
                                      precision="int2", _T=7680)),
        ("u4-agc-rel0b16-int2T76", dict(firfold=False, lookahead=-4,
                                        agc_plan="rel0b16",
                                        precision="int2", _T=7680)),
        # round-5: the AGC leg at the new T=12800 headline default
        # (auto m=2 under AGC -> 12800 is mto-aligned)
        ("u4-agc-rel0b16-int2T128", dict(firfold=False, lookahead=-4,
                                         agc_plan="rel0b16",
                                         precision="int2", _T=12800,
                                         _MB=12800)),
        ("u4-agc-rel0b32-int2T76", dict(firfold=False, lookahead=-4,
                                        agc_plan="rel0b32",
                                        precision="int2", _T=7680)),
        # rel0c = fully-tiled blocked rel0 (pass 0 + apply become tile
        # passes; see ops/fused.py)
        ("u4-agc-rel0c16-int2T76", dict(firfold=False, lookahead=-4,
                                        agc_plan="rel0c16",
                                        precision="int2", _T=7680)),
        ("u4-agc-rel0c8-int2T76", dict(firfold=False, lookahead=-4,
                                       agc_plan="rel0c8",
                                       precision="int2", _T=7680)),
        ("u4-agc-rel0c32-int2T76", dict(firfold=False, lookahead=-4,
                                        agc_plan="rel0c32",
                                        precision="int2", _T=7680)),
        ("la4-agc-rel0b-int2T76", dict(firfold=False, lookahead=4,
                                       agc_plan="rel0b",
                                       precision="int2", _T=7680)),
        ("u4-i8m4T76d5", dict(firfold=False, lookahead=-4,
                              precision="i8", m=4, _T=7680, dma_depth=5)),
        ("u4-i8m4T76d6", dict(firfold=False, lookahead=-4,
                              precision="i8", m=4, _T=7680, dma_depth=6)),
        ("u4-i8m4T76d8", dict(firfold=False, lookahead=-4,
                              precision="i8", m=4, _T=7680, dma_depth=8)),
        ("u8-i8", dict(firfold=False, lookahead=-8, precision="i8",
                       _T=4800)),
        ("192k-i8u8", dict(firfold=False, lookahead=-8, precision="i8",
                           _out=192000, _T=5120)),
        # decisive 192k pair: auto resolves to i8 on 16-bit-grid
        # content even at to=640; int3 forces the pre-round-4 wsplit
        ("192k-int3u8", dict(firfold=False, lookahead=-8,
                             precision="int3", _out=192000, _T=5120)),
        # 44.1k -> 192k upsample ladder (to=640 wsplit, m=1; the 84,141x
        # round-2 row predates the unrolled serial loop — VERDICT r3 #9)
        ("192k-la4", dict(firfold=False, lookahead=4, _out=192000,
                          _T=5120)),
        ("192k-u4", dict(firfold=False, lookahead=-4, _out=192000,
                         _T=5120)),
        ("192k-u8", dict(firfold=False, lookahead=-8, _out=192000,
                         _T=5120)),
        ("192k-u16", dict(firfold=False, lookahead=-16, _out=192000,
                          _T=5120)),
        # unfused-chain block-dtype A/B (bf16 stage boundaries)
        ("pallas-f32", dict(_scan="pallas", _T=4096)),
        ("pallas-bf16", dict(_scan="pallas", _T=4096, block_bf16=True)),
    ]
    only = os.environ.get("AB_ONLY")
    variants = [(n, k) for n, k in catalog
                if not only or n in only.split(",")]

    runs = []
    for name, kw in variants:
        unwrap = kw.pop("_unwrap", False)
        T_v = kw.pop("_T", T)
        mb = kw.pop("_MB", None)
        out_rate = kw.pop("_out", 48000)
        scan = kw.pop("_scan", "fused")
        content = kw.pop("_content", None)
        if mb is not None:
            kw["max_block"] = mb
        pcm_v = pcm
        if content == "grid24" and pcm is not None:
            # odd int24 requantization of the same PCM (a 24-bit
            # master): fails the int16 probe, passes the int24 one
            import numpy as _np

            k24 = _np.rint(pcm.astype(_np.float64) * 8388608.0)
            k24 = _np.where(k24 % 2 == 0,
                            _np.clip(k24 + 1, None, 8388607), k24)
            pcm_v = (k24 / 8388608.0).astype(_np.float32)
        node, state = make_flagship(
            n_streams, seconds=seconds, scan_mode=scan,
            out_rate=out_rate,
            source_pcm=pcm_v, with_agc=with_agc, **kw,
        )
        if unwrap:
            node = node.input
            state = node.init_state()
        ra = make_run(node, state, T_v, n_blocks, r1)
        rb = make_run(node, state, T_v, n_blocks, r2)
        # warm (compile) both repetition counts
        e, v = ra()
        float(e)
        e, v = rb()
        float(e)
        runs.append((name, T_v, node.spec.sample_rate, ra, rb))
        print(f"# built {name}", file=sys.stderr, flush=True)

    best = {name: [float("inf"), float("inf")] for name, *_ in runs}
    for _ in range(rounds):
        for name, T_v, _rate, ra, rb in runs:
            t0 = time.perf_counter()
            e, v = ra()
            float(e), float(v)
            best[name][0] = min(best[name][0], time.perf_counter() - t0)
            t0 = time.perf_counter()
            e, v = rb()
            float(e), float(v)
            best[name][1] = min(best[name][1], time.perf_counter() - t0)

    for name, T_v, rate, ra, rb in runs:
        ta, tb = best[name]
        per = (tb - ta) / ((r2 - r1) * n_blocks)
        agg = (n_streams * T_v / rate) / per
        print(json.dumps({
            "variant": name + ("+agc" if with_agc else ""),
            "us_per_block": round(per * 1e6, 2),
            "aggregate_x": round(agg, 0),
        }), flush=True)


if __name__ == "__main__":
    main()
