#!/usr/bin/env python
"""Headline benchmark: aggregate realtime multiple for the 512-stream
batched pipeline (BASELINE.json north star).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is value / 1000 (the BASELINE target is >= 1000x realtime for
512 concurrent 48 kHz stereo streams through resample+mix+effects+limit on
one chip).

Methodology: the whole render runs device-side as `lax.scan` over blocks
inside ONE jit, ending in a scalar reduction that is read back to the host.
Timing is differential (N2 vs N1 blocks), which cancels the fixed dispatch
+ readback overhead of the host<->device transport. (On this machine's
tunnel transport, `block_until_ready` does not actually synchronize, so
naive per-block wall timing measures dispatch only.)
"""
import json
import os
import time

import jax
import jax.numpy as jnp


def _run_scan(node, state, T, n_blocks, repeat, reps=4):
    """Time `repeat` device-side repetitions of an n_blocks-block render.

    The whole repetition loop runs inside ONE jit (each iteration's state
    is perturbed by 0*previous_energy so XLA cannot CSE the repeats), so
    the host<->device transport is paid once regardless of `repeat`;
    differential timing over two `repeat` values then isolates pure
    device compute. min-of-reps on top: block times are tens of
    microseconds while the tunnel transport jitters by milliseconds.
    """
    def body(s, _):
        s, out, v = node.emit(s, T)
        # force full computation of the mix output every block
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
            s = jax.tree_util.tree_unflatten(treedef, lv)
            return render_once(s)

        return jax.lax.fori_loop(
            0, repeat, outer, (jnp.float32(0.0), jnp.int32(0))
        )

    e, v = run(state)
    float(e)  # warm: compile + execute
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        e, v = run(state)
        e, v = float(e), float(v)
        best = min(best, time.perf_counter() - t0)
    return best, e, v


def main():
    n_streams = int(os.environ.get("BENCH_STREAMS", "512"))
    scan_mode = os.environ.get("BENCH_SCAN_MODE", "fused")
    # 12800 (20 grid steps at the i8/m=4 record config) won the round-5
    # block-size ladder after SamplesBuffer learned per-instance
    # pad_frames (the old PAD_FRAMES=8192 class cap stopped round 4 at
    # 7680): T=12800 beat T=7680 in 4 of 5 interleaved in-process runs
    # (+9%, +23% in the two direct head-to-heads that favored it; one
    # outlier run favored 7680), with T=15360 regressing. Larger blocks
    # amortize the fixed per-block cost until the chunk ring outgrows
    # what the DMA pipeline hides. (Round-3's 4800 note still holds for
    # the m=2/3 classes — T is re-aligned to the resolved m*to below.)
    T_req = int(os.environ.get("BENCH_BLOCK", "12800"))
    T = T_req
    # m="auto": 4 chunks/grid-step when the content probe selects the
    # i8 byte-piece layout (lossless for 16-bit-sourced PCM like
    # music.wav; the halved landing pads fit m=4 with a 5-deep DMA
    # pipeline), 3 for int2, else 2. dma_depth follows the flagship
    # auto rules (5 at i8/m4, 3 at int2/m3, else 4).
    m_env = os.environ.get("BENCH_M", "auto")
    m = m_env if m_env == "auto" else int(m_env)
    dd_env = os.environ.get("BENCH_DMA_DEPTH", "auto")
    dma_depth = dd_env if dd_env == "auto" else int(dd_env)
    if scan_mode == "fused":
        # T_cap: ceil-align the request to every candidate m*to
        # (lcm(320, 480, 640) = 1920 for the auto probe: m=2/3/4 at
        # to=160) — this sizes the padded source window so ANY resolved
        # m fits. Each leg then runs at its own T, the request rounded
        # to the leg's RESOLVED m*to (12800 is exact for m=4/m=2; an
        # int2/m3 leg rounds to 12960), so the record shape is what
        # actually runs instead of a silently ceil-aligned 13440.
        mto = 1920 if m == "auto" else m * 160
        T = max(mto, -(-T_req // mto) * mto)
    T_cap = T

    def _leg_T(p):
        """The block size a leg actually runs: the requested T rounded
        to the leg's resolved m*to, floor-aligned if nearest-rounding
        would exceed the padded window T_cap."""
        from rodio_tpu.flagship import FusedWidePipeline as _FWP

        if not isinstance(p, _FWP):
            return T_cap
        mto_ = p.m * p.to
        t = max(mto_, round(T_req / mto_) * mto_)
        if t > T_cap:
            t = (T_cap // mto_) * mto_
        return t
    # blocks default keeps the rendered-frame budget at the round-4
    # scale (60 x 7680 = 460,800 frames) as T grows: the source buffer
    # sizes with n_blocks*T, and 60 blocks of T=13440 (16.4 s of wide
    # [1024, frames] f32 PCM + the chunked layout) exhausted HBM.
    nb_env = os.environ.get("BENCH_BLOCKS", "auto")
    n_blocks = (max(12, 460800 // T_cap) if nb_env == "auto"
                else int(nb_env))
    r1 = int(os.environ.get("BENCH_R1", "1"))
    r2 = int(os.environ.get("BENCH_R2", "6"))

    from rodio_tpu.flagship import make_flagship
    from rodio_tpu.io.wav import read_wav

    # source material must cover one repetition's span
    seconds = (n_blocks * T / 48000.0) * (44100 / 48000.0) + 1.0

    pcm = None
    wav_path = "/root/reference/assets/music.wav"
    if os.path.exists(wav_path):
        try:
            pcm, _rate = read_wav(wav_path)
        except Exception:
            pcm = None

    node, state = make_flagship(
        n_streams, seconds=seconds, scan_mode=scan_mode, source_pcm=pcm,
        with_agc=os.environ.get("BENCH_AGC", "0") == "1",
        max_block=max(T_cap, 8192),
        lookahead=(lambda v: v if v == "auto" else int(v))(
            os.environ.get("BENCH_LOOKAHEAD", "auto")),
        precision=os.environ.get("BENCH_PRECISION", "auto"),
        firfold=os.environ.get("BENCH_FIRFOLD", "auto"),
        agc_ring=os.environ.get("BENCH_AGC_RING", "bf16"),
        agc_group=int(os.environ.get("BENCH_AGC_GROUP", "0")),
        agc_plan=os.environ.get("BENCH_AGC_PLAN", "auto"),
        m=m, dma_depth=dma_depth,
        inkernel_limit=os.environ.get("BENCH_INKERNEL_LIMIT", "0") == "1",
    )

    # resolved kernel configuration (VERDICT r3 weak #1: driver benches
    # must be self-diagnosing — the probe/auto resolution is content-
    # and env-dependent, so the JSON line records what actually ran)
    from rodio_tpu.flagship import FusedWidePipeline

    pipe = node if isinstance(node, FusedWidePipeline) else getattr(
        node, "input", None
    )
    T = _leg_T(pipe)
    if isinstance(pipe, FusedWidePipeline):
        config = {
            "kernel": "fused",
            "precision": pipe.precision,
            "m": pipe.m,
            "lookahead": pipe.lookahead,
            "dma_depth": pipe.dma_depth,
            "gain_post": bool(pipe.gain_post),
            "agc": ("group%d" % pipe._agc_group if pipe.with_agc
                    and pipe._agc_group else
                    ("%s+%s_ring" % (
                        pipe._agc_rel0 or "serial",
                        pipe._agc_ring) if pipe.with_agc else "off")),
            "T": T,
            "blocks": n_blocks,
            "source": "music.wav" if pcm is not None else "noise",
        }
    else:
        config = {"kernel": scan_mode, "T": T, "blocks": n_blocks,
                  "source": "music.wav" if pcm is not None else "noise"}

    t_a, e_a, v_a = _run_scan(node, state, T, n_blocks, r1)
    t_b, e_b, v_b = _run_scan(node, state, T, n_blocks, r2)

    # sanity: every block fully valid, audio flowed
    assert v_b == n_blocks * T, (
        f"invalid frames in bench run: {v_b} != {n_blocks * T}"
    )
    assert e_b > 0, "bench produced silence"

    per_block = (t_b - t_a) / ((r2 - r1) * n_blocks)
    audio_seconds_per_block = n_streams * T / 48000.0
    realtime_multiple = audio_seconds_per_block / per_block

    line = {
        "metric": (
            "Audio-seconds/sec/chip (realtime multiple), "
            f"{n_streams}-stream mix+effects @48kHz stereo"
        ),
        "value": round(realtime_multiple, 1),
        "unit": "x realtime (aggregate)",
        "vs_baseline": round(realtime_multiple / 1000.0, 3),
        "config": config,
        "per_block_us": round(per_block * 1e6, 2),
    }

    def _sol(pipe_, T_, per_block_us_, agc_plan_=""):
        """Modeled speed-of-light fraction for the resolved config
        (benches/sol_model.py; BENCHMARKS.md round-5 accounting). Only
        attached for configs the static model covers: the 147->160
        flagship ratio, and (under AGC) the rel0b blocked plan."""
        try:
            import sys as _sys

            _sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "benches"))
            import sol_model

            if not isinstance(pipe_, FusedWidePipeline):
                return None
            if pipe_.to != 160 or pipe_.precision == "highest":
                return None
            if pipe_.with_agc and not agc_plan_.startswith("rel0b"):
                return None
            rpc = int(agc_plan_[5:]) if agc_plan_[5:].isdigit() else 8
            leg = sol_model.model_leg(
                pipe_.precision, pipe_.m, with_agc=pipe_.with_agc,
                rpc=rpc, lookahead=max(abs(int(pipe_.lookahead)), 1))
            steps = T_ // leg["mto"]
            meas = per_block_us_ / steps
            floor = max(leg["vpu_floor_us_per_grid_step"],
                        leg["dma_us_at_565"])
            return {
                "vpu_floor_us_per_grid_step":
                    leg["vpu_floor_us_per_grid_step"],
                "dma_us_at_565": leg["dma_us_at_565"],
                "measured_us_per_grid_step": round(meas, 2),
                "fraction": round(floor / meas, 3),
            }
        except Exception:
            return None

    sol = _sol(pipe, T, line["per_block_us"])
    if sol is not None:
        line["sol"] = sol

    # AGC-ON leg (VERDICT r4 weak #2 / ask #2): the BASELINE north star
    # names automatic_gain_control among the fused effects, so the
    # driver-captured evidence must carry an exact-contract AGC number
    # every run, not just the AGC-off headline. Same differential
    # methodology, same farm, in-kernel AGC with the rel0-family plan
    # (exact for the default release_time=0). Skipped when the main
    # run is already AGC-on (BENCH_AGC=1).
    # free the headline leg's device buffers (wide PCM + chunk layout)
    # before building the next leg — four concurrent legs at large T
    # exhaust HBM
    import gc

    del node, state
    if pipe is not None:
        del pipe
    gc.collect()

    if (os.environ.get("BENCH_AGC_ON", "1") == "1"
            and os.environ.get("BENCH_AGC", "0") != "1"):
        # measured-best AGC config (round-5 interleaved ladder): the
        # blocked rel0 smoother at RPC=16 on int2 (282.9 us/block) beats
        # i8+rel0f (289.0) — under AGC the kernel is compute-bound on
        # the smoother chain, so i8's DMA savings don't pay and chain
        # blocking does
        agc_plan_on = os.environ.get("BENCH_AGC_ON_PLAN", "rel0b16")
        node_a, state_a = make_flagship(
            n_streams, seconds=seconds, scan_mode=scan_mode,
            source_pcm=pcm, with_agc=True, max_block=max(T_cap, 8192),
            agc_plan=agc_plan_on, m=m, dma_depth=dma_depth,
            precision=os.environ.get("BENCH_AGC_ON_PRECISION", "int2"),
        )
        pipe_a = node_a if isinstance(node_a, FusedWidePipeline) \
            else getattr(node_a, "input", None)
        T_a = _leg_T(pipe_a)
        ta_a, _, _ = _run_scan(node_a, state_a, T_a, n_blocks, r1)
        tb_a, e_a2, v_a2 = _run_scan(node_a, state_a, T_a, n_blocks, r2)
        assert v_a2 == n_blocks * T_a and e_a2 > 0
        pb_a = (tb_a - ta_a) / ((r2 - r1) * n_blocks)
        line["agc_on"] = {
            "value": round(n_streams * T_a / 48000.0 / pb_a, 1),
            "per_block_us": round(pb_a * 1e6, 2),
            "T": T_a,
            "plan": (pipe_a._agc_rel0 or "serial")
            if isinstance(pipe_a, FusedWidePipeline) else agc_plan_on,
            "precision": pipe_a.precision
            if isinstance(pipe_a, FusedWidePipeline) else "?",
        }
        sol_a = _sol(pipe_a, T_a, line["agc_on"]["per_block_us"],
                     agc_plan_=(pipe_a._agc_rel0 or "")
                     if isinstance(pipe_a, FusedWidePipeline)
                     else agc_plan_on)
        if sol_a is not None:
            line["agc_on"]["sol"] = sol_a
        del node_a, state_a, pipe_a
        gc.collect()

    # CONTENT LADDER (VERDICT r4 weak #4 / ask #5): the headline feeds
    # music.wav (16-bit grid -> the lossless i8 byte-piece class); the
    # unfavorable classes need driver-tracked numbers too. Derive a
    # 24-bit-grid master (odd int24 requantization of the same PCM,
    # ~-138 dB from the original -> auto resolves the 3-byte-piece i24
    # layout) and a float master (irrational rescale fills the f32
    # mantissas -> auto falls back to the exact int3 piece layout).
    # Lighter runs (half the blocks): the rows are informational; the
    # vs_baseline number stays the headline's.
    if (os.environ.get("BENCH_CONTENT_LADDER", "1") == "1"
            and pcm is not None
            and os.environ.get("BENCH_AGC", "0") != "1"):
        import numpy as _np

        k24 = _np.rint(pcm.astype(_np.float64) * 8388608.0)
        k24 = _np.where(k24 % 2 == 0, _np.clip(k24 + 1, None, 8388607),
                        k24)
        pcm24 = (k24 / 8388608.0).astype(_np.float32)
        pcmf = (pcm.astype(_np.float64) * 0.73070283).astype(_np.float32)
        nb_l = max(n_blocks // 2, 8)
        line["content_ladder"] = {}
        for row, pc in (("24bit", pcm24), ("float", pcmf)):
            node_l, state_l = make_flagship(
                n_streams, seconds=seconds, scan_mode=scan_mode,
                source_pcm=pc, max_block=max(T_cap, 8192),
                precision="auto", m="auto", dma_depth="auto",
            )
            pipe_l = node_l if isinstance(node_l, FusedWidePipeline) \
                else getattr(node_l, "input", None)
            T_l = _leg_T(pipe_l)
            tl_a, _, _ = _run_scan(node_l, state_l, T_l, nb_l, r1)
            tl_b, e_l, v_l = _run_scan(node_l, state_l, T_l, nb_l, r2)
            assert v_l == nb_l * T_l and e_l > 0
            pb_l = (tl_b - tl_a) / ((r2 - r1) * nb_l)
            line["content_ladder"][row] = {
                "value": round(n_streams * T_l / 48000.0 / pb_l, 1),
                "per_block_us": round(pb_l * 1e6, 2),
                "precision": pipe_l.precision
                if isinstance(pipe_l, FusedWidePipeline) else "?",
                "m": pipe_l.m
                if isinstance(pipe_l, FusedWidePipeline) else 0,
            }
            del node_l, state_l, pipe_l
            gc.collect()

    # on-hardware parity gate (VERDICT r2 #6): every driver bench also
    # records the config-1..4 + hot-kernel deviations vs the refimpl
    # oracle and regenerates PARITY_TPU.md, so a TPU-only numerical
    # regression shows up in BENCH_r*.json instead of waiting for a
    # manual tools/parity_tpu.py run. Progress goes to stderr; stdout
    # stays ONE JSON line.
    if os.environ.get("BENCH_PARITY", "1") != "0":
        import sys
        import traceback

        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tools"),
        )
        try:
            import parity_tpu

            rows, ok = parity_tpu.run_all(quiet=True, write_md=True)
            worst = max(rows, key=lambda r: r[1] / max(r[2], 1e-300))
            line["parity_tpu"] = {
                "all_ok": bool(ok),
                "cases": {r[0]: [r[1], r[2]] for r in rows},
                "worst_case": worst[0],
            }
        except Exception:
            traceback.print_exc(file=sys.stderr)
            line["parity_tpu"] = {"all_ok": False, "error": "crashed"}

    print(json.dumps(line))


if __name__ == "__main__":
    main()
