"""Round-5 probe: adjudicate ALL cross golden residuals (VERDICT r4 item 5).

Extends scratch/adjudicate_art.py's measurement from art to every
reference pair, and from the initial map to the FINAL map:

1. INITIAL map (per pair): for every pixel where our WTA argmin differs
   from the golden initial, measure the relative cost margin between our
   winner and the golden winner in OUR aggregated volume (p50 = 0 means
   bit-equal ties), and check our winner's cost <= the golden winner's
   (argmin correctness on our floats).  This is the art methodology
   verbatim (argmin diff count / margins / winner-cost check).

2. FINAL map (per pair): causal decomposition.  Run OUR vote+median tail
   on the GOLDEN initial image.  Wherever that reproduces the golden
   final, the reference's own tail applied to the same input agrees with
   ours — so every pixel where our full-pipeline final differs from the
   golden final while tail(golden initial) matches it is PROPAGATION of
   the (tie-proven) initial diffs, not a tail defect.  Any pixel where
   tail(golden initial) itself disagrees with the golden final is a
   genuine tail divergence and is reported separately with its vote-tab
   count margin (count delta 0 = an exact histogram tie).

Run on CPU: PYTHONPATH=/root/repo python scratch/adjudicate_cross.py
(Measured results are pinned in PARITY.md's quality notes and cited from
tests/test_pipelines_golden.py.)
"""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from stereo_matchin_tpu import REFERENCE_CONFIG as cfg  # noqa: E402
from stereo_matchin_tpu.io import png  # noqa: E402
from stereo_matchin_tpu.io.datasets import load_pair  # noqa: E402
from stereo_matchin_tpu.models.cross_based import (  # noqa: E402
    _aggr_stage, _arms_stage, _median_stage, _sad_stage,
    cross_pipeline)
from stereo_matchin_tpu import ops  # noqa: E402

PAIRS = ("tsukuba", "teddy", "cones", "laundry", "art")

# d <-> 8-bit code tables through the reference encoding (injective).
from stereo_matchin_tpu.ops.common import _golden_codes  # noqa: E402

enc = _golden_codes(cfg.d_max).astype(np.int32)
assert len(np.unique(enc)) == cfg.num_disp
inv = np.full(256, -1, np.int32)
inv[enc] = np.arange(cfg.num_disp)


def to8(img):
    return np.round(np.asarray(img) * 255).astype(np.int32)


qcfg = cfg.replace(median_dispatch_quirk=True)

for pair in PAIRS:
    root = f"/root/reference/stereo_matching/{pair}"
    left_np, right_np = load_pair(pair)
    left, right = jnp.asarray(left_np), jnp.asarray(right_np)
    g_init = np.asarray(png.read_gray(f"{root}/cross_based_initial.png"))
    g_final8 = to8(png.read_gray(f"{root}/cross_based_disparity.png"))
    d_gold = inv[to8(g_init)]
    assert (d_gold >= 0).all(), f"{pair}: golden byte off the d/60 grid"

    # --- stage pieces (quirk on, production path) ------------------------
    ml = _median_stage(left)
    mr = _median_stage(right)
    ml = ops.median_dispatch_truncate(ml)
    mr = ops.median_dispatch_truncate(mr)
    arms_l = _arms_stage(ml, cfg.arm_len, cfg.tau, cfg.legacy_cross_arm_quirk)
    arms_r = _arms_stage(mr, cfg.arm_len, cfg.tau, cfg.legacy_cross_arm_quirk)
    cost = _sad_stage(ml, mr, cfg.num_disp)

    # --- 1) INITIAL adjudication (art methodology, both aggr impls) ------
    for impl in ("taps", "prefix"):
        aggr = np.asarray(_aggr_stage(cost, arms_l, arms_r, cfg.arm_len,
                                      impl))
        d0 = np.asarray(jax.jit(ops.wta_argmin)(jnp.asarray(aggr))).astype(
            np.int32)
        diff = d0 != d_gold
        n = int(diff.sum())
        line = (f"[{pair} initial {impl}] argmin diffs: {n} "
                f"({100 * n / d0.size:.2f}%)")
        if n:
            ys, xs = np.nonzero(diff)
            c_ours = aggr[d0[ys, xs], ys, xs]
            c_gold = aggr[d_gold[ys, xs], ys, xs]
            margin = np.abs(c_ours - c_gold) / np.maximum(np.abs(c_gold),
                                                          1e-30)
            line += (f"; margin p50={np.percentile(margin, 50):.1e} "
                     f"<=1e-6 {100 * float((margin <= 1e-6).mean()):.1f}% "
                     f"<=1e-4 {100 * float((margin <= 1e-4).mean()):.1f}% "
                     f"max={margin.max():.1e}; ours<=gold "
                     f"{100 * float((c_ours <= c_gold).mean()):.1f}%")
        print(line, flush=True)

    # --- 2) FINAL decomposition ------------------------------------------
    # Our full-pipeline final (quirk on, fused production path).
    res = cross_pipeline(left, right, qcfg)
    ours_final8 = to8(res.final)
    n_final = int((ours_final8 != g_final8).sum())

    # Our tail on the GOLDEN initial image.
    g_init_img = jnp.asarray(g_init.astype(np.float32))
    voted = ops.histogram_vote(g_init_img, arms_l, cfg.d_max,
                               quantize=cfg.quantize_maps,
                               arm_len=cfg.arm_len, impl=cfg.oii_impl)
    tail = ops.median_dispatch_truncate(ops.median3x3(voted))
    tail8 = to8(tail)
    tail_diff = tail8 != g_final8
    n_tail = int(tail_diff.sum())

    ours_diff = ours_final8 != g_final8
    explained = ours_diff & ~tail_diff
    print(f"[{pair} final] our-vs-golden diffs: {n_final} "
          f"({100 * n_final / g_final8.size:.2f}%); tail(golden initial) "
          f"vs golden final diffs: {n_tail} "
          f"({100 * n_tail / g_final8.size:.3f}%); our diffs explained by "
          f"initial-tie propagation: {int(explained.sum())}/{n_final}",
          flush=True)
    if n_tail:
        # Genuine tail divergences: adjudicate with vote-tab count margins
        # at those pixels (tab built from the golden initial, our arms).
        idx = np.asarray(jnp.clip(
            (g_init_img * cfg.d_max).astype(jnp.int32), 0, cfg.d_max))
        ys, xs = np.nonzero(tail_diff)
        arms = np.asarray(arms_l)
        H, W = idx.shape
        n_tie = 0
        for y, x in list(zip(ys, xs))[:200]:
            tab = np.zeros(cfg.num_disp, np.int64)
            for i in range(arms[2, y, x], arms[3, y, x] + 1):
                ry = min(max(y + i, 0), H - 1)
                for j in range(arms[0, ry, x], arms[1, ry, x] + 1):
                    tab[idx[min(max(y + i, 0), H - 1),
                            min(max(x + j, 0), W - 1)]] += 1
            ours_v = inv[tail8[y, x]] if tail8[y, x] in enc else -1
            gold_v = inv[g_final8[y, x]] if g_final8[y, x] in enc else -1
            if ours_v >= 0 and gold_v >= 0 and tab[ours_v] == tab[gold_v]:
                n_tie += 1
        print(f"    tail divergences with EXACT vote-count ties "
              f"(first {min(n_tail, 200)} checked): {n_tie}", flush=True)
