#!/usr/bin/env python
"""A/B: firfold on/off and look-ahead sweep for the fused flagship.

All variants timed inside ONE process (CLAUDE.md: tunnel run-to-run
spread ~8%; in-process A/B cancels it). Differential scan timing per
bench.py methodology.
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


def time_variant(node, state, T, n_blocks, r1, r2, reps=4):
    def body(s, _):
        s, out, v = node.emit(s, T)
        return s, (jnp.sum(out * out), jnp.sum(v))

    def render_once(s):
        _, (energy, valid) = jax.lax.scan(body, s, None, length=n_blocks)
        return jnp.sum(energy), jnp.sum(valid)

    def mk(repeat):
        @jax.jit
        def run(s0):
            leaves, treedef = jax.tree_util.tree_flatten(s0)
            i_f = next(i for i, l in enumerate(leaves)
                       if jnp.issubdtype(l.dtype, jnp.floating))

            def outer(_, acc):
                e_prev, _v = acc
                lv = list(leaves)
                lv[i_f] = lv[i_f] + (e_prev * 0.0).astype(lv[i_f].dtype)
                return render_once(
                    jax.tree_util.tree_unflatten(treedef, lv)
                )

            return jax.lax.fori_loop(
                0, repeat, outer, (jnp.float32(0.0), jnp.int32(0))
            )

        e, v = run(state)
        float(e)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            e, v = run(state)
            float(e), float(v)
            best = min(best, time.perf_counter() - t0)
        return best

    ta, tb = mk(r1), mk(r2)
    return (tb - ta) / ((r2 - r1) * n_blocks)


def main():
    from rodio_tpu.flagship import make_flagship
    from rodio_tpu.io.wav import read_wav

    n_streams = int(os.environ.get("AB_STREAMS", "512"))
    T = int(os.environ.get("AB_BLOCK", "4160"))
    n_blocks = int(os.environ.get("AB_BLOCKS", "40"))
    with_agc = os.environ.get("AB_AGC", "0") == "1"
    seconds = (n_blocks * T / 48000.0) * (44100 / 48000.0) + 1.0
    pcm = None
    try:
        pcm, _ = read_wav("/root/reference/assets/music.wav")
    except Exception:
        pass

    variants = []
    for name, kw in [
        ("la4", dict(firfold=False, lookahead=4)),
        ("la4-seplimit", dict(firfold=False, lookahead=4,
                              inkernel_limit=False)),
        ("la4-nolimit", dict(firfold=False, lookahead=4,
                             inkernel_limit=False, _unwrap=True)),
        ("la4-int2", dict(firfold=False, lookahead=4, precision="int2")),
        ("la4-m3", dict(firfold=False, lookahead=4, m=3, _T=4800)),
        ("la4-m3-int2", dict(firfold=False, lookahead=4, m=3,
                             precision="int2", _T=4800)),
        ("la4-ringf32", dict(firfold=False, lookahead=4,
                             agc_ring="f32")),
        ("ff-la1", dict(firfold=True, lookahead=1)),
        ("ff-la2", dict(firfold=True, lookahead=2)),
        ("ff-la4", dict(firfold=True, lookahead=4)),
        ("ff-la8", dict(firfold=True, lookahead=8)),
    ]:
        if os.environ.get("AB_ONLY") and name not in os.environ["AB_ONLY"].split(","):
            continue
        variants.append((name, kw))

    for name, kw in variants:
        unwrap = kw.pop("_unwrap", False)
        T_v = kw.pop("_T", T)
        node, state = make_flagship(
            n_streams, seconds=seconds, scan_mode="fused",
            source_pcm=pcm, with_agc=with_agc, **kw,
        )
        if unwrap:
            node = node.input          # drop the master Limit stage
            state = node.init_state()
        per = time_variant(node, state, T_v, n_blocks, 1, 6)
        agg = (n_streams * T_v / 48000.0) / per
        print(json.dumps({
            "variant": name + ("+agc" if with_agc else ""),
            "us_per_block": round(per * 1e6, 2),
            "aggregate_x": round(agg, 0),
        }), flush=True)


if __name__ == "__main__":
    main()
