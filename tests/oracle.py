"""Per-pixel numpy oracles for the reference OpenCL kernel semantics.

These are deliberately naive, loop-based transliterations of what each
reference kernel computes (citations in each function), independent of the
vectorised jnp ops in `stereo_matchin_tpu.ops`.  Unit tests compare the two
on tiny random inputs; any disagreement is a semantics bug in the ops layer.

All images are float32 RGB in [0,1] on the UNORM8 grid (like the reference's
CL_UNORM_INT8 images); disparity "images" are single-channel [0,1] values.
"""

from __future__ import annotations

import numpy as np

F = np.float32


def clamp(v, lo, hi):
    return max(lo, min(hi, v))


def unorm8(v):
    # Ties toward zero — the reference device's measured UNORM8 write
    # conversion (see ops/common.py unorm8 for the golden-map evidence).
    return F(np.ceil(F(v) * F(255.0) - F(0.5)) / F(255.0))


# --- median.cl --------------------------------------------------------------

def median3x3(img):
    H, W = img.shape[:2]
    out = np.empty_like(img)
    for y in range(H):
        for x in range(W):
            taps = [
                img[clamp(y + dy, 0, H - 1), clamp(x + dx, 0, W - 1)]
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
            ]
            out[y, x] = np.sort(np.stack(taps, 0), axis=0)[4]
    return out


# --- cross.cl ---------------------------------------------------------------

def cross_arms(img, arm_len=25, tau=0.10, legacy_quirk=True):
    """check_all: 25 unrolled checks at distances 2..26; the first check's
    result is discarded (running arm starts at 1), so effective checks run
    at distances 3..arm_len+1 and arms lie in [1, arm_len]."""
    H, W = img.shape[:2]
    out = np.zeros((4, H, W), np.int32)
    dirs = [(0, -1), (0, 1), (-1, 0), (1, 0)]  # (dy, dx) for h-, h+, v-, v+
    for p, (dy, dx) in enumerate(dirs):
        for y in range(H):
            for x in range(W):
                anchor = img[y, x]
                arm = 1
                first_dist = 3 if legacy_quirk else 2
                for dist in range(first_dist, arm_len + 2):
                    if arm >= arm_len:
                        break
                    ny, nx = y + dy * dist, x + dx * dist
                    inb = 0 <= ny < H and 0 <= nx < W
                    nb = img[clamp(ny, 0, H - 1), clamp(nx, 0, W - 1)]
                    sim = bool(np.all(np.abs(nb - anchor) < tau))
                    if sim and inb and dist - 1 == arm + 1:
                        arm += 1
                    else:
                        break
                sign = -1 if p in (0, 2) else 1
                out[p, y, x] = sign * arm
    return out


# --- aggregation.cl / asw_aggr.cl ------------------------------------------

def sad_cost_volume(left, right, num_disp, scale=1.0):
    H, W = left.shape[:2]
    cost = np.zeros((num_disp, H, W), F)
    for d in range(num_disp):
        for y in range(H):
            for x in range(W):
                xr = clamp(x - d, 0, W - 1)
                # asw_aggr.cl multiplies each pixel by 255 BEFORE the SAD.
                lp = left[y, x].astype(F) * F(scale)
                rp = right[y, xr].astype(F) * F(scale)
                cost[d, y, x] = F(np.sum(np.abs(lp - rp)))
    return cost


# --- integral_h/v.cl + oii_hcross/vcross.cl ---------------------------------

def oii_chain(cost, arms_l, arms_r):
    """Integral_h -> Oii_hcross -> Integral_v -> Oii_vcross, per the .cl files."""
    D, H, W = cost.shape
    ih = np.cumsum(cost, axis=2)
    temp = np.zeros_like(cost)
    for d in range(D):
        for y in range(H):
            for x in range(W):
                xr = max(0, x - d)
                hm = max(arms_r[0, y, xr], arms_l[0, y, x])
                hp = min(arms_r[1, y, xr], arms_l[1, y, x])
                delta = hp - hm
                temp[d, y, x] = (
                    ih[d, y, min(W - 1, x + hp)] - ih[d, y, max(0, x + hm - 1)]
                ) / delta
    iv = np.cumsum(temp, axis=1)
    out = np.zeros_like(cost)
    for d in range(D):
        for y in range(H):
            for x in range(W):
                xr = max(0, x - d)
                vm = max(arms_r[2, y, xr], arms_l[2, y, x])
                vp = min(arms_r[3, y, xr], arms_l[3, y, x])
                delta = vp - vm
                out[d, y, x] = (
                    iv[d, min(H - 1, y + vp), x] - iv[d, max(0, y + vm - 1), x]
                ) / delta
    return out


# --- disparity.cl (histogram vote) ------------------------------------------

def histogram_vote(disp_img, arms_l, d_max):
    """Mode over the cross region; ties -> highest d; truncated UNORM reads."""
    H, W = disp_img.shape
    out = np.zeros((H, W), F)
    for y in range(H):
        for x in range(W):
            tab = np.zeros(d_max + 1, np.int64)
            vm, vp = arms_l[2, y, x], arms_l[3, y, x]
            for i in range(vm, vp + 1):
                ry = clamp(y + i, 0, H - 1)
                hm, hp = arms_l[0, ry, x], arms_l[1, ry, x]
                for j in range(hm, hp + 1):
                    v = disp_img[clamp(y + i, 0, H - 1), clamp(x + j, 0, W - 1)]
                    tab[int(F(v) * F(d_max))] += 1
            best, best_i = -1, 0
            for i in range(d_max + 1):
                if tab[i] >= best:
                    best, best_i = tab[i], i
            out[y, x] = unorm8(best_i / F(d_max))
    return out


# --- asw_vsupport.cl / asw_hsupport.cl --------------------------------------

def support_weights(img, radius, gamma_c, gamma_p, axis):
    H, W = img.shape[:2]
    T = 2 * radius + 1
    out = np.zeros((T, H, W), F)
    for t in range(T):
        for y in range(H):
            for x in range(W):
                if axis == 0:
                    ny, nx = clamp(y + t - radius, 0, H - 1), x
                    dist = abs(y - ny)
                else:
                    ny, nx = y, clamp(x + t - radius, 0, W - 1)
                    dist = abs(x - nx)
                p = img[y, x].astype(F) * 255
                q = img[ny, nx].astype(F) * 255
                c = np.sum(np.abs(p - q)) / F(gamma_c)
                out[t, y, x] = np.exp(-c - dist / F(gamma_p))
    return out


# --- asw_vcost_aggregation.cl / asw_hcost_aggregation.cl --------------------

def asw_aggregate_pass(cost, w_left, w_right, axis, radius, eps=1e-5):
    D, H, W = cost.shape
    out = np.zeros_like(cost)
    den_out = np.zeros_like(cost)
    for d in range(D):
        for y in range(H):
            for x in range(W):
                xr = max(x - d, 0)
                num, den = F(eps), F(eps)
                for t in range(2 * radius + 1):
                    ww = w_left[t, y, x] * w_right[t, y, xr]
                    if axis == 1:
                        c = cost[d, clamp(y + t - radius, 0, H - 1), x]
                    else:
                        c = cost[d, y, clamp(x + t - radius, 0, W - 1)]
                    num += ww * c
                    den += ww
                out[d, y, x] = num / den
                den_out[d, y, x] = den
    return out, den_out


# --- asw_wta.cl / asw_wta_ref.cl --------------------------------------------

def two_min(values, big=1e5):
    c1, c2, d1 = F(big), F(big), 0
    for i, v in enumerate(values):
        if v < c2:
            c2 = v
        if v < c1:
            c2 = c1
            d1 = i
            c1 = v
    return c1, c2, d1


def wta(cost, big=1e5, penalty=None):
    """asw_WTA (penalty=None) or asw_WTA_REF's reference-view scan.

    penalty: optional (D, H, W) additive term.
    Returns (d_ref, conf_ref, d_target, conf_target) per pixel.
    """
    D, H, W = cost.shape
    d_ref = np.zeros((H, W), np.int32)
    conf_ref = np.zeros((H, W), F)
    d_tar = np.zeros((H, W), np.int32)
    conf_tar = np.zeros((H, W), F)
    for y in range(H):
        for x in range(W):
            vals = [
                cost[i, y, x] + (penalty[i, y, x] if penalty is not None else 0)
                for i in range(D)
            ]
            c1, c2, d1 = two_min(vals, big)
            d_ref[y, x] = d1
            conf_ref[y, x] = (c2 - c1) / c2
            # Epipolar target scan (bresenham with slope exactly 1).
            tc1, tc2, tb = F(big), F(big), d1
            for i in range(d1):
                xq = max(0, x - i)
                b = d1 + xq - x
                v = cost[b, y, xq] + (
                    penalty[b, y, xq] if penalty is not None else 0
                )
                if v < tc2:
                    tc2 = v
                if v < tc1:
                    tc2 = tc1
                    tb = b
                    tc1 = v
            d_tar[y, x] = tb
            conf_tar[y, x] = (tc2 - tc1) / tc2
    return d_ref, conf_ref, d_tar, conf_tar


def wta_ref(cost, ref_val, ref_den, ref_val_t, ref_den_t, penalty=0.085, big=1e5):
    """asw_WTA_REF: penalty uses the CENTRE pixel's refinement value/denom and
    the step index i (not b) in the |ref - i| term; the target scan's penalty
    uses the centre target refinement but probes cost at (b, y, xq)."""
    D, H, W = cost.shape
    d_ref = np.zeros((H, W), np.int32)
    conf_ref = np.zeros((H, W), F)
    d_tar = np.zeros((H, W), np.int32)
    conf_tar = np.zeros((H, W), F)
    for y in range(H):
        for x in range(W):
            vals = [
                F(penalty) * ref_den[y, x] * abs(ref_val[y, x] - i) + cost[i, y, x]
                for i in range(D)
            ]
            c1, c2, d1 = two_min(vals, big)
            d_ref[y, x] = d1
            conf_ref[y, x] = (c2 - c1) / c2
            tc1, tc2, tb = F(big), F(big), d1
            for i in range(d1):
                xq = max(0, x - i)
                b = d1 + xq - x
                v = (
                    F(penalty) * ref_den_t[y, x] * abs(ref_val_t[y, x] - i)
                    + cost[b, y, xq]
                )
                if v < tc2:
                    tc2 = v
                if v < tc1:
                    tc2 = tc1
                    tb = b
                    tc1 = v
            d_tar[y, x] = tb
            conf_tar[y, x] = (tc2 - tc1) / tc2
    return d_ref, conf_ref, d_tar, conf_tar


# --- consist.cl -------------------------------------------------------------

def consistency(d_ref, d_tar, conf_ref, conf_tar, threshold=1.001):
    """Inputs on the [0, d_max] scale (already image-quantised)."""
    H, W = d_ref.shape
    filled = np.zeros((H, W), F)
    cr = conf_ref.copy()
    ct = conf_tar.copy()
    consistent = np.zeros((H, W), bool)
    for y in range(H):
        for x in range(W):
            ok = abs(d_tar[y, x] - d_ref[y, x]) < threshold
            consistent[y, x] = ok
            filled[y, x] = d_ref[y, x] if ok else d_tar[y, x]
            if not ok:
                cr[y, x] = 0
                ct[y, x] = 0
    return filled, cr, ct, consistent


# --- asw_refinement_v.cl / asw_refinement_h.cl ------------------------------

def refine_v(img, d_est, conf, radius, gamma_c=10.94, gamma_p=118.78, eps=1e-5):
    H, W = img.shape[:2]
    val = np.zeros((H, W), F)
    den = np.zeros((H, W), F)
    for y in range(H):
        for x in range(W):
            p = img[y, x].astype(F) * 255
            num, dnm = F(eps), F(eps)
            for t in range(2 * radius + 1):
                ny = clamp(y + t - radius, 0, H - 1)
                q = img[ny, x].astype(F) * 255
                w = np.exp(
                    -np.sum(np.abs(p - q)) / F(gamma_c) - abs(y - ny) / F(gamma_p)
                )
                Fc = conf[ny, x]
                num += w * Fc * d_est[ny, x]
                dnm += w * Fc
            val[y, x] = num / dnm
            den[y, x] = dnm
    return val, den


def refine_h(img, value_v, den_v, conf, radius, gamma_c=10.94, gamma_p=118.78, eps=1e-5):
    H, W = img.shape[:2]
    val = np.zeros((H, W), F)
    den = np.zeros((H, W), F)
    for y in range(H):
        for x in range(W):
            p = img[y, x].astype(F) * 255
            num, dnm = F(eps), F(eps)
            for t in range(2 * radius + 1):
                nx = clamp(x + t - radius, 0, W - 1)
                q = img[y, nx].astype(F) * 255
                w = np.exp(
                    -np.sum(np.abs(p - q)) / F(gamma_c) - abs(x - nx) / F(gamma_p)
                )
                Fc = conf[y, nx]
                num += w * Fc * value_v[y, nx] * den_v[y, nx]
                dnm += w * Fc * den_v[y, nx]
            val[y, x] = num / dnm
            den[y, x] = dnm
    return val, den


# --- asw_vcost.cl / asw_cost.cl (vestigial 2-D aggregation) -----------------

def asw_aggregate_2d(cost, wv_l, wv_r, wh_l, wh_r, radius):
    D, H, W = cost.shape
    T = 2 * radius + 1
    out = np.zeros_like(cost)
    for d in range(D):
        for y in range(H):
            for x in range(W):
                xr = max(0, x - d)
                num_v = F(0)
                num_h = F(0)
                den_h = F(0)
                for i in range(T):
                    yy = clamp(y + i - radius, 0, H - 1)
                    num_v += cost[d, yy, x]
                    wwv = wv_l[i, y, x] * wv_r[i, y, xr]
                    for j in range(T):
                        wwh = wh_l[j, yy, x] * wh_r[j, yy, xr]
                        xx = clamp(x + j - radius, 0, W - 1)
                        num_h += wwh * wwv * cost[d, yy, xx]
                        den_h += wwh
                out[d, y, x] = num_v / T + num_h / den_h
    return out
