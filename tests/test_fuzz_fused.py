"""Randomized differential fuzzing of the FUSED mega-kernel (VERDICT r3
#3): the ~10 interacting kernel modes (precision pieces x m x
lookahead rolled/unrolled x subblk x ufir/firfold x gain_post x AGC
off/exact/group x ring dtype x dma_depth x live retune/set_agc_params x
rolling-ring farm feed) sampled at random and rendered against the
EXACT UNFUSED chain (Resample -> BltFilter(exact) -> [AGC exact] ->
Amplify -> WideMixer) under the Pallas interpreter on CPU.

Reference semantics being pinned: src/source/blt.rs:556-561 (biquad),
src/source/limit.rs:903-988 / src/source/agc.rs:397-496 (envelope and
gain recurrences), src/mixer.rs:185-198 (the stream-axis sum).

On mismatch the config AUTO-SHRINKS toward the default kernel plan
(features disabled one at a time while the failure persists) and the
assertion reports the minimal failing configuration.
"""
import dataclasses

import jax
import numpy as np
import pytest

from rodio_tpu.conversions.resample import Resample
from rodio_tpu.effects.agc import AgcSettings, AutomaticGainControl
from rodio_tpu.effects.basic import Amplify
from rodio_tpu.effects.blt import BltFilter
from rodio_tpu.flagship import ChunkRingFeed, FusedFarmPipeline, \
    FusedWidePipeline
from rodio_tpu.parallel.batch import WideMixer
from rodio_tpu.sources.generators import SamplesBuffer

# rate-ratio pool: (in_rate, out_rate) -> (fr, to). Mixed small/large
# `to` exercises both the direct integer-weight dot (to <= 256) and the
# wsplit 4*hi+lo path; the pow2 pair exercises lag % (m*to) == 0 ring
# reads and tiny grids.
PAIRS = [
    (44100, 48000),   # fr 147, to 160 — the flagship ratio
    (48000, 44100),   # fr 160, to 147 — downsample (frame dropping)
    (22050, 48000),   # fr 147, to 320 — wsplit weights
    (32000, 48000),   # fr 2,   to 3   — tiny chunks, many grid steps
    (24000, 48000),   # fr 1,   to 2   — pow2 ratio
]
AGC_PAIRS = [(44100, 48000), (22050, 48000)]


@dataclasses.dataclass
class Cfg:
    seed: int
    in_rate: int
    out_rate: int
    S: int
    C: int
    m: int
    precision: str
    lookahead: int
    subblk: int
    ufir: bool
    firfold: bool
    gain_post: object
    dma_depth: int
    agc: str            # "off" | "exact" | "group"
    agc_group: int
    agc_ring: str
    agc_plan: str       # "auto" | "rel0" (exact-mode only; rel=0 plan)
    content: str        # "noise" | "quant16"
    freq: float
    q: float
    T: int
    blocks: int
    retune_at: object   # block index or None
    agc_set_at: object  # block index or None
    farm: bool

    def label(self):
        return {k: v for k, v in dataclasses.asdict(self).items()
                if v not in (None, False, 0, "off")}


def _mto(cfg):
    import math

    g = math.gcd(cfg.in_rate, cfg.out_rate)
    return cfg.m * (cfg.out_rate // g), (cfg.in_rate // g,
                                         cfg.out_rate // g)


def _sample_cfg(seed: int) -> Cfg:
    rng = np.random.default_rng(1234 + seed)
    agc = rng.choice(["off", "off", "off", "exact", "group"])
    if agc != "off":
        in_rate, out_rate = AGC_PAIRS[int(rng.integers(len(AGC_PAIRS)))]
        C = 2
    else:
        in_rate, out_rate = PAIRS[int(rng.integers(len(PAIRS)))]
        C = int(rng.choice([1, 2, 2]))
    import math

    g = math.gcd(in_rate, out_rate)
    fr, to = in_rate // g, out_rate // g
    m_max = 3 if to <= 320 else (1280 // to)
    m = int(rng.integers(1, min(m_max, 3) + 1))
    mto = m * to

    precision = str(rng.choice(
        ["auto", "int3", "int2", "highest", "i8", "i24"]))
    firfold = bool(rng.random() < 0.15 and agc == "off" and to >= 2)
    if firfold and precision not in ("int3", "int2"):
        precision = "int3"
    if precision == "i8" and to <= 160 and rng.random() < 0.3:
        m = 4  # the halved i8 landing pads admit a 4-chunk grid step
        mto = m * to
    ufir = bool(rng.random() < 0.15 and not firfold)
    subblk = 0
    if (agc == "off" and not firfold and not ufir
            and rng.random() < 0.2):
        for G in (8, 4, 2):
            if mto % G == 0 and mto // G >= 4:
                subblk = mto // G
                break

    las = [la for la in (1, 2, 4, 8) if mto % la == 0]
    lookahead = int(rng.choice(las))
    # statically-unrolled form only where the interpreter compile stays
    # tractable (unrolled AGC smoothers at mto >= 160 take minutes)
    if agc == "off" and mto <= 160 and not subblk and rng.random() < 0.4:
        lookahead = -lookahead
    if subblk:
        lookahead = abs(lookahead)

    agc_group = 0
    if agc == "group":
        groups = [gq for gq in (4, 8, 16) if mto % gq == 0]
        if not groups:
            agc = "exact"
        else:
            agc_group = int(rng.choice(groups))

    gain_post = "auto"
    if agc == "off" and not firfold:
        pool = (["auto", True] if precision in ("i8", "i24")
                else ["auto", True, False])  # int8 chunks must stay raw
        gain_post = rng.choice(pool)
        gain_post = bool(gain_post) if gain_post != "auto" else "auto"

    content = str(rng.choice(
        ["noise", "noise", "quant16", "grid16", "grid24"]))
    if precision == "i8":
        content = "grid16"  # the i8 probe asserts int16-grid content
    elif precision == "i24":
        content = "grid24"  # the i24 probe asserts int24-grid content
    T = mto * int(rng.integers(2, 4))
    # the AGC ring must wrap: render past the 4096-frame window lag
    blocks = (-(-5200 // T) + 1) if agc != "off" else 4
    blocks = min(blocks, 18)
    farm = bool(agc == "off" and not subblk and not firfold
                and precision in ("int3", "int2") and rng.random() < 0.25)
    return Cfg(
        seed=seed, in_rate=in_rate, out_rate=out_rate,
        S=int(rng.choice([2, 4, 8])), C=C, m=m, precision=precision,
        lookahead=lookahead, subblk=subblk, ufir=ufir, firfold=firfold,
        gain_post=gain_post, dma_depth=int(rng.integers(2, 6)),
        agc=agc, agc_group=agc_group,
        agc_ring=str(rng.choice(["bf16", "f32"])),
        # rel0 structural plans (round-4/5): only legal at
        # release_time=0, i.e. the exact-mode default AgcSettings()
        # this fuzzer uses. rel0b additionally needs 8 | m*to (the
        # sampler can't see mto yet; _check downgrades it to rel0f).
        agc_plan=(str(rng.choice(["rel0", "rel0f", "rel0b", "rel0c"]))
                  if agc == "exact" and rng.random() < 0.6
                  else "auto"),
        content=content,
        freq=float(np.float32(rng.uniform(300.0, 6000.0))),
        q=float(np.float32(rng.uniform(0.4, 1.5))),
        T=T, blocks=blocks,
        retune_at=(int(rng.integers(1, max(blocks - 1, 2)))
                   if rng.random() < 0.5 else None),
        agc_set_at=(int(rng.integers(1, max(blocks - 1, 2)))
                    if (agc != "off" and rng.random() < 0.5) else None),
        farm=farm,
    )


def _content(cfg):
    rng = np.random.default_rng(77000 + cfg.seed)
    mto, (fr, to) = _mto(cfg)
    # enough input for blocks*T output frames plus kernel look-ahead
    frames = (cfg.blocks * cfg.T * fr) // to + 4 * fr + 64
    wide = cfg.S * cfg.C
    if cfg.content == "quant16":
        k = rng.integers(-32768, 32768, size=(wide, frames))
        pcm = (k / 32768.0 * 0.25).astype(np.float32)
    elif cfg.content == "grid16":
        # exactly on the int16 grid (x = k/2^15): the i8 byte-piece
        # probe passes; precision="auto" resolves to i8 on this content
        k = rng.integers(-32768, 32768, size=(wide, frames))
        pcm = (k / 32768.0).astype(np.float32)
    elif cfg.content == "grid24":
        # exactly on the int24 grid but NOT the int16 grid (odd k):
        # precision="auto" resolves to the 3-byte-piece i24 layout
        k = rng.integers(-4194304, 4194304, size=(wide, frames)) * 2 + 1
        pcm = (k / 8388608.0).astype(np.float32)
    else:
        pcm = (rng.standard_normal((wide, frames)) * 0.15).astype(
            np.float32
        )
    gains = rng.uniform(0.5, 1.5, cfg.S).astype(np.float32) / cfg.S
    return pcm, gains


def _agc_settings(cfg):
    # group mode's documented contract targets release times >> the
    # group duration (AgcGroup note, effects/agc.py); the instant-
    # release default on noise deviates by design (~1e-1 per-sample)
    return (AgcSettings(release_time=0.05) if cfg.agc == "group"
            else AgcSettings())


def _build_fused(cfg, pcm, gains):
    need = {"rel0b": 8, "rel0c": 16}.get(cfg.agc_plan)
    if need and _mto(cfg)[0] % need:
        # blocked plans need their chunk count to divide m*to; keep the
        # config otherwise
        cfg = dataclasses.replace(
            cfg, agc_plan="rel0c8" if (cfg.agc_plan == "rel0c"
                                       and _mto(cfg)[0] % 8 == 0)
            else "rel0f")
    node = SamplesBuffer(cfg.S * cfg.C, cfg.in_rate, pcm)
    return FusedWidePipeline(
        node, cfg.out_rate, gains, cfg.S, "low_pass", cfg.freq, cfg.q,
        m=cfg.m, precision=cfg.precision, lookahead=cfg.lookahead,
        subblk=cfg.subblk, firfold=cfg.firfold, ufir=cfg.ufir,
        gain_post=cfg.gain_post, dma_depth=cfg.dma_depth,
        with_agc=(cfg.agc != "off"),
        agc_settings=_agc_settings(cfg) if cfg.agc != "off" else None,
        agc_ring=cfg.agc_ring, agc_group=cfg.agc_group,
        agc_plan=cfg.agc_plan,
    )


def _build_exact(cfg, pcm, gains):
    ch = Resample(SamplesBuffer(cfg.S * cfg.C, cfg.in_rate, pcm),
                  cfg.out_rate, max_block=max(cfg.T, 512))
    blt = BltFilter(ch, "low_pass", cfg.freq, cfg.q, mode="exact")
    ch = blt
    agc = None
    if cfg.agc != "off":
        agc = AutomaticGainControl(ch, _agc_settings(cfg), mode="exact",
                                   streams=cfg.S)
        ch = agc
    ch = Amplify(ch, np.repeat(gains, cfg.C))
    return WideMixer(ch, cfg.S), blt, agc


def _find_sub(state, key):
    if isinstance(state, dict):
        if key in state:
            return state
        for v in state.values():
            r = _find_sub(v, key)
            if r is not None:
                return r
    return None


def _render_farm(cfg, pcm, gains, fused):
    """The same fused kernel over a ROLLING ChunkRingFeed (the streaming
    farm's device path): ring_chunks = 3 pushes deep so the modulo chunk
    indexing wraps mid-render."""
    mto, (fr, to) = _mto(cfg)
    Kp = cfg.T // to
    per_lane = np.repeat(gains, cfg.C)
    gp = bool(fused.gain_post)
    feed = ChunkRingFeed(cfg.S * cfg.C, cfg.in_rate, fr, Kp, 3 * Kp,
                         fused.precision, per_lane, gain_post=gp)
    farm = FusedFarmPipeline(feed, cfg.out_rate, cfg.S, "low_pass",
                             cfg.freq, cfg.q, m=cfg.m,
                             lookahead=cfg.lookahead)
    st = farm.init_state()
    em = jax.jit(lambda s: farm.emit(s, cfg.T))
    pos = 0
    outs = []
    for blk in range(cfg.blocks):
        # the prime push consumes (Kp+1)*fr frames (chunks 0..Kp-1 plus
        # the first carry frame); every steady push then supplies the
        # NEXT Kp*fr frames — the carry already holds the boundary frame
        need = (Kp + 1) * fr if blk == 0 else Kp * fr
        block = pcm[:, pos : pos + need]
        pos += need
        st = {**st, "in": feed.push(st["in"], block, prime=(blk == 0))}
        if cfg.retune_at == blk:
            st = farm.retune(st, freq=cfg.freq * 0.5)
        st, out, v = em(st)
        outs.append(np.asarray(out))
    assert not bool(st["in"]["overflow"]), "farm ring overflowed"
    return np.concatenate(outs, axis=1)


def _render_pair(cfg):
    """(fused_out, exact_out) [C, blocks*T] rendered with the same knob
    schedule on both sides."""
    pcm, gains = _content(cfg)
    fused = _build_fused(cfg, pcm, gains)
    chain, blt, agc = _build_exact(cfg, pcm, gains)

    sf = fused.init_state()
    su = chain.init_state()
    ef = jax.jit(lambda s: fused.emit(s, cfg.T))
    eu = jax.jit(lambda s: chain.emit(s, cfg.T))
    fouts, uouts = [], []
    for blk in range(cfg.blocks):
        if cfg.retune_at == blk:
            sf = fused.retune(sf, freq=cfg.freq * 0.5)
            d = _find_sub(su, "coef")
            d.update(blt.retune(d, freq=cfg.freq * 0.5))
        if cfg.agc_set_at == blk:
            sf = fused.set_agc_params(sf, attack=0.5)
            d = _find_sub(su, "att")
            d.update(agc.set_attack_time(d, 0.5))
        sf, of, vf = ef(sf)
        su, ou, vu = eu(su)
        assert int(vf) == int(vu) == cfg.T, (
            f"validity diverged at block {blk}: {int(vf)} vs {int(vu)}"
        )
        fouts.append(np.asarray(of))
        uouts.append(np.asarray(ou))
    f = np.concatenate(fouts, axis=1)
    u = np.concatenate(uouts, axis=1)
    if cfg.farm:
        fa = _render_farm(cfg, pcm, gains, fused)
        return fa, u
    return f, u


def _tolerance(cfg):
    if cfg.agc == "group":
        # normalized-absolute bound: the relaxed-contract deviation at
        # release >> group duration is ~1e-3 class (AgcGroup note), but
        # mid-run knob changes / fast attacks legitimately reach a few
        # percent. The fuzz oracle catches ring/indexing bugs (which
        # produce O(1) garbage gains), not contract-tightening.
        return ("norm", 5e-2)
    if cfg.agc == "exact":
        # the documented AGC parity contract (decomposed rsqrt desired-
        # gain computer + optional bf16 sq-ring vs the sqrt/div chain)
        return ("abs", 2e-5)
    # the 1e-6 parity CONTRACT is the binding bound (with small S the
    # per-stream gains are O(1), so the exact-mix 2^-18-relative split
    # residual alone reaches ~7e-7 — see test_fused_tail_drain note)
    tol = 1e-6
    if cfg.ufir or cfg.firfold:
        tol = 2e-6     # u-form reassociation class (test_fused)
    if cfg.precision == "int2" and cfg.content != "quant16":
        tol = 4e-6     # documented int2 worst-case class
    if cfg.content in ("grid16", "grid24"):
        # f32 rounding is RELATIVE to signal amplitude; the 1e-6 class
        # above is calibrated on 0.15-0.25-amplitude content, while
        # grid16/grid24 are full-scale (peak 1.0). Verified 4.0x
        # exactly: seed 41's minimal config measures 2.21e-6 on grid16
        # and 5.51e-7 with the same kernel on 0.25-scale quant16.
        tol *= 4.0
    if cfg.q > 0.8:
        # resonant feedback integrates the CPU test host's 1-ulp FMA-
        # contraction differences (the documented XLA:CPU artifact —
        # test_fuzz_differential uses 2e-5 for biquad chains; the TPU
        # render is bit-exact, PARITY_TPU.md config2)
        tol = max(tol, 1e-5)
    # narrow-band stiffness: a low-cutoff biquad's pole sits near the
    # unit circle, so per-step ulp reassociation (look-ahead rows vs the
    # sequential scan) integrates with gain ~ fs/fc (fuzz seeds 20/23:
    # ~2e-6 at fc ~ 200-300 Hz)
    f_min = cfg.freq * (0.5 if cfg.retune_at is not None else 1.0)
    tol *= max(1.0, 0.1 * cfg.out_rate / f_min)
    return ("abs", tol)


def _check(cfg):
    f, u = _render_pair(cfg)
    kind, tol = _tolerance(cfg)
    if kind == "norm":
        err = float(np.abs(f - u).max() / max(np.abs(u).max(), 1e-9))
    else:
        err = float(np.abs(f - u).max())
    return err, tol


def _shrink(cfg):
    """Greedy feature removal toward the default kernel plan while the
    failure persists."""
    steps = [
        ("farm", False), ("ufir", False), ("firfold", False),
        ("subblk", 0), ("gain_post", "auto"), ("retune_at", None),
        ("agc_set_at", None), ("agc_ring", "f32"), ("agc_group", 0),
        ("agc_plan", "auto"),
        ("dma_depth", 4), ("m", 2), ("precision", "int3"),
        ("lookahead", 2),
    ]
    cur = cfg
    for name, val in steps:
        if getattr(cur, name) == val:
            continue
        cand = dataclasses.replace(cur, **{name: val})
        if name == "agc_group" and cand.agc == "group":
            cand = dataclasses.replace(cand, agc="exact")
        mto, _ = _mto(cand)
        if name == "lookahead" and mto % 2:
            continue
        try:
            err, tol = _check(cand)
        except Exception:
            continue
        if err > tol:
            cur = cand
    return cur


def _run(seed):
    cfg = _sample_cfg(seed)
    err, tol = _check(cfg)
    if err > tol:
        small = _shrink(cfg)
        serr, stol = _check(small)
        pytest.fail(
            f"fused-kernel fuzz seed={seed}: err={err:.3g} > {tol:g}; "
            f"minimal failing config (err={serr:.3g}): {small.label()}"
        )


@pytest.mark.parametrize("seed", [0, 2, 3, 4, 7, 91])
def test_fuzz_fused_quick(seed):
    """Quick-tier slice of the fused-kernel fuzz (~40 s on the 1-core
    host), pinned so every AGC mode has quick numeric coverage
    (ADVICE r4 #2): seeds 0/3 = grouped AGC, 2 = exact+auto plan on
    the i24 layout, 7 = rel0c tiled plan, 91 = the shipping rel0b
    blocked plan at int2."""
    _run(seed)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [1, 5, 6, 8, 9] + list(range(10, 52)))
def test_fuzz_fused(seed):
    _run(seed)
