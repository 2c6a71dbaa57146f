"""Independent NumPy oracles for the stereo kernels.

Each function re-implements, from the behavioral spec, the exact semantics
of one reference pipeline stage (file:line cites point at
/root/reference/src/process_functional.py unless noted), including the
reference's quirks (SGM's in-place sweep aliasing, truncation casts,
boundary clipping). They are deliberately loop-based and only meant for
tiny inputs; the reference layout (ndisp, H, W) is used throughout and
converted at call sites.
"""

from __future__ import annotations

import numpy as np


def cost_volume_oracle(feat_l, feat_r, ndisp):
    """Spec: :78-113 (shift-and-dot, border fills, negation)."""
    height, width = feat_l.shape[:2]
    lcv = np.zeros((ndisp, height, width), dtype=np.float32)
    for d in range(ndisp):
        for w in range(d, width):
            lcv[d, :, w] = np.sum(feat_l[:, w] * feat_r[:, w - d], axis=-1)
    for d in range(ndisp - 1, 0, -1):
        lcv[d:ndisp, :, d - 1] = np.mean(lcv[d:ndisp, :, d:d + 3], axis=-1)

    rcv = np.zeros_like(lcv)
    for d in range(ndisp):
        rcv[d, :, : width - d] = lcv[d, :, d:]
    for d in range(ndisp - 1, 0, -1):
        rcv[d:ndisp, :, width - d] = np.mean(
            rcv[d:ndisp, :, width - d - 3: width - d], axis=-1
        )
    return -lcv, -rcv


def cross_regions_oracle(image, tau, dist):
    """Spec: :571-657. Returns per-pixel support-region pixel lists."""
    height, width = image.shape[:2]

    def grow(center_value, line, start, step, limit, include_self):
        picks = []
        offsets = range(0 if include_self else 1, limit)
        for off in offsets:
            pos = start + step * off
            if np.abs(center_value - line[pos]) >= tau:
                break
            picks.append(pos)
        return picks

    vertical = {}
    horizontal = {}
    for h in range(height):
        for w in range(width):
            ups = grow(image[h, w], image[:, w], h, -1, min(dist, h + 1), True)
            downs = grow(image[h, w], image[:, w], h, +1, min(dist, height - h), False)
            vertical[h, w] = [(hh, w) for hh in ups + downs]
            lefts = grow(image[h, w], image[h, :], w, -1, min(dist, w + 1), True)
            rights = grow(image[h, w], image[h, :], w, +1, min(dist, width - w), False)
            horizontal[h, w] = [(h, ww) for ww in lefts + rights]

    regions = {}
    for h in range(height):
        for w in range(width):
            members = []
            for vh, vw in vertical[h, w]:
                members.extend(horizontal[vh, vw])
            regions[h, w] = members
    return regions


def cbca_oracle(volume, regions, iterations):
    """Spec: :146-182 (iterated region-mean of disparity fibers)."""
    ndisp, height, width = volume.shape
    out = volume.astype(np.float64)
    for _ in range(iterations):
        nxt = np.empty_like(out)
        for h in range(height):
            for w in range(width):
                acc = np.zeros(ndisp, dtype=np.float64)
                for qh, qw in regions[h, w]:
                    acc += out[:, qh, qw]
                nxt[:, h, w] = acc / len(regions[h, w])
        out = nxt
    return out.astype(np.float32)


def sgm_sweep_oracle(img_l, img_r, volume, r, p1, p2, q1, q2, dthr, choice):
    """Spec: :476-568 — one in-place directional DP sweep.

    ``volume`` is mutated in place and also returned (the reference's
    aliasing behavior at :544 is the point of this oracle).
    """
    ndisp, height, width = volume.shape
    rh, rw = r
    hs = range(rh, height) if rh >= 0 else range(height + rh - 1, -1, -1)
    ws = range(rw, width) if rw >= 0 else range(width + rw - 1, -1, -1)

    own = img_l if choice == "L" else img_r
    other = img_r if choice == "L" else img_l

    p1_map = np.full((ndisp, height, width), p1, dtype=np.float32)
    p2_map = np.full((ndisp, height, width), p2, dtype=np.float32)
    d1 = np.zeros((height, width), dtype=np.float32)
    d2 = np.zeros((ndisp, height, width), dtype=np.float32)
    for h in hs:
        for w in ws:
            d1[h, w] = np.abs(own[h, w] - own[h - rh, w - rw])
            for d in range(ndisp):
                if choice == "L":
                    if w - d < 0 or w - rw - d < 0:
                        continue
                    d2[d, h, w] = np.abs(other[h, w - d] - other[h - rh, w - rw - d])
                else:
                    if w + d >= width or w - rw + d >= width:
                        continue
                    d2[d, h, w] = np.abs(other[h, w + d] - other[h - rh, w - rw + d])

    both_small = (d1 < dthr) & (d2 < dthr)
    both_large = (d1 >= dthr) & (d2 >= dthr)
    mixed = ~(both_small | both_large)
    p1_map[both_large] /= q2
    p2_map[both_large] /= q2
    p1_map[mixed] /= q1
    p2_map[mixed] /= q1

    for h in hs:
        for w in ws:
            prev = volume[:, h - rh, w - rw].copy()
            prev_min = prev.min()
            for d in range(ndisp):
                cands = [prev[d], prev_min + p2_map[d, h, w]]
                if d > 0:
                    cands.append(prev[d - 1] + p1_map[d, h, w])
                if d < ndisp - 1:
                    cands.append(prev[d + 1] + p1_map[d, h, w])
                volume[d, h, w] = volume[d, h, w] + min(cands) - prev_min
    return volume


def sgm_average_oracle(lcv, rcv, img_l, img_r, p1, p2, q1, q2, dthr, v):
    """Spec: :187-235 with the aliasing quirk — 4 chained in-place sweeps."""
    out = []
    for volume, choice in ((lcv.copy(), "L"), (rcv.copy(), "R")):
        for (r, p1_eff) in (
            ((0, 1), p1),
            ((0, -1), p1),
            ((-1, 0), p1 / v),
            ((1, 0), p1 / v),
        ):
            volume = sgm_sweep_oracle(
                img_l, img_r, volume, r, p1_eff, p2, q1, q2, dthr, choice
            )
        out.append(volume)
    return out[0], out[1]


def wta_oracle(volume):
    """Spec: :239-272 (strict-< scan keeps first minimum)."""
    ndisp, height, width = volume.shape
    disp = np.zeros((height, width), dtype=np.float32)
    for h in range(height):
        for w in range(width):
            best, best_d = np.inf, -1
            for d in range(ndisp):
                if volume[d, h, w] < best:
                    best, best_d = volume[d, h, w], d
            disp[h, w] = best_d
    return disp


def interpolation_oracle(disp_l, disp_r, ndisp):
    """Spec: :279-378 (classification + 4-direction fill)."""
    height, width = disp_l.shape
    status = np.zeros((height, width), dtype=np.int32)
    for h in range(height):
        for w in range(width):
            dl = int(disp_l[h, w])
            if w < dl:
                status[h, w] = 2
                continue
            if abs(dl - disp_r[h, w - dl]) <= 1:
                continue
            for d in range(min(w + 1, ndisp)):
                if abs(d - disp_r[h, w - d]) <= 1:
                    status[h, w] = 1
                    break
            if status[h, w] == 0:
                status[h, w] = 2

    out = np.empty_like(disp_l)
    for h in range(height):
        for w in range(width):
            if status[h, w] == 0:
                out[h, w] = disp_l[h, w]
                continue
            if status[h, w] == 1:
                found = []
                for ww in range(w + 1, width):
                    if status[h, ww] == 0:
                        found.append(disp_l[h, ww])
                        break
                for ww in range(w - 1, -1, -1):
                    if status[h, ww] == 0:
                        found.append(disp_l[h, ww])
                        break
                for hh in range(h + 1, height):
                    if status[hh, w] == 0:
                        found.append(disp_l[hh, w])
                        break
                for hh in range(h - 1, -1, -1):
                    if status[hh, w] == 0:
                        found.append(disp_l[hh, w])
                        break
                out[h, w] = np.median(np.array(found, np.float32)) if found else disp_l[h, w]
            else:
                out[h, w] = disp_l[h, w]
                for ww in range(w + 1, width):
                    if status[h, ww] == 0:
                        out[h, w] = disp_l[h, ww]
                        break
    return status, out


def subpixel_oracle(disp, volume):
    """Spec: :381-400 (Python2 int() truncation casts)."""
    ndisp, height, width = volume.shape
    out = np.empty_like(disp)
    for h in range(height):
        for w in range(width):
            d = disp[h, w]
            if int(d - 1) < 0 or int(d + 1) >= ndisp:
                out[h, w] = d
                continue
            cm = volume[int(d - 1), h, w]
            cp = volume[int(d + 1), h, w]
            cc = volume[int(d), h, w]
            denom = 2.0 * (cp - 2.0 * cc + cm)
            out[h, w] = d if denom == 0 else d - (cp - cm) / denom
    return out


def median_oracle(disp, fh, fw):
    """Spec: :403-421 (boundary-clipped window median)."""
    height, width = disp.shape
    out = np.empty_like(disp)
    for h in range(height):
        for w in range(width):
            window = disp[
                max(0, h - (fh - 1) // 2): min(height, h + (fh - 1) // 2 + 1),
                max(0, w - (fw - 1) // 2): min(width, w + (fw - 1) // 2 + 1),
            ]
            out[h, w] = np.median(window)
    return out


def bilateral_oracle(image, disp, fh, fw, mean, sigma, threshold):
    """Spec: :424-470 + util.py:45-48."""
    height, width = disp.shape
    c1 = 1.0 / (np.sqrt(2 * np.pi) * sigma)
    c2 = -1.0 / (2 * sigma * sigma)
    ch, cw = (fh - 1) // 2, (fw - 1) // 2
    kernel = np.zeros((fh, fw), dtype=np.float32)
    for i in range(fh):
        for j in range(fw):
            dist = np.sqrt((i - ch) ** 2 + (j - cw) ** 2)
            kernel[i, j] = c1 * np.exp(c2 * (dist - mean) ** 2)

    out = np.empty_like(disp)
    for h in range(height):
        for w in range(width):
            hs, he = max(0, h - ch), min(height, h + ch + 1)
            ws, we = max(0, w - cw), min(width, w + cw + 1)
            win = disp[hs:he, ws:we]
            ker = kernel[ch - (h - hs): ch + (he - h), cw - (w - ws): cw + (we - w)]
            mask = (np.abs(image[hs:he, ws:we] - image[h, w]) < threshold).astype(
                np.float32
            )
            weights = ker * mask
            out[h, w] = np.sum(weights * win) / np.sum(weights)
    return out


def joint_regions_oracle(regions_self, regions_other, d, choice, width):
    """Disparity-conditioned region filtering — the paper-INTENDED semantics
    of the reference's disabled compute_disparity_union_region
    (spec: :661-729). The reference's literal code cannot execute (NameError
    ``d__union_region`` at :686) and its membership test compares
    coordinates elementwise (``region[region == pos]``) rather than as
    pairs; this oracle implements pair membership (see PARITY.md)."""
    out = {}
    for (h, w), members in regions_self.items():
        no_corr = (w < d) if choice == "L" else (w + d >= width)
        if no_corr:
            out[(h, w)] = list(members)
            continue
        corr = (h, w - d) if choice == "L" else (h, w + d)
        other = set(regions_other[corr])
        kept = []
        for (h_, w_) in members:
            if choice == "L":
                if w_ < d or (h_, w_ - d) in other:
                    kept.append((h_, w_))
            else:
                if w_ + d >= width or (h_, w_ + d) in other:
                    kept.append((h_, w_))
        out[(h, w)] = kept
    return out


def joint_cbca_oracle(volume, regions_self, regions_other, iterations, choice):
    """Iterated averaging over the disparity-conditioned joint regions
    (spec: :146-182 applied to the :661-729 regions)."""
    ndisp, height, width = volume.shape
    regions_per_d = [
        joint_regions_oracle(regions_self, regions_other, d, choice, width)
        for d in range(ndisp)
    ]
    out = volume.astype(np.float64)
    for _ in range(iterations):
        nxt = np.empty_like(out)
        for d in range(ndisp):
            for h in range(height):
                for w in range(width):
                    members = regions_per_d[d][(h, w)]
                    acc = 0.0
                    for qh, qw in members:
                        acc += out[d, qh, qw]
                    nxt[d, h, w] = acc / len(members)
        out = nxt
    return out.astype(np.float32)
