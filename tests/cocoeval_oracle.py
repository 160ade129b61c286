"""Test-only oracle reproducing pycocotools' COCOeval (iouType='keypoints')
loop-for-loop from its published implementation (pycocotools/cocoeval.py;
pycocotools itself is not installable in this offline environment).

This is deliberately structured like the original — per-(img, areaRng)
evaluateImg with python loops, annotation-ID match bookkeeping, the
try/except-abort precision interpolation — and NOT like the vectorized
implementation under test (advmix_tpu/evaluation/cocoeval_np.py), so the
differential test catches implementation bugs rather than shared code
paths. The reference calls the real COCOeval at
`/root/reference/lib/dataset/coco.py:441-454`.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

COCO_SIGMAS_17 = np.array([
    .26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62,
    1.07, 1.07, .87, .87, .89, .89,
]) / 10.0


class OracleParams:
    def __init__(self):
        # pycocotools Params.setKpParams
        self.iouThrs = np.linspace(
            .5, 0.95, int(np.round((0.95 - .5) / .05)) + 1, endpoint=True)
        self.recThrs = np.linspace(
            .0, 1.00, int(np.round((1.00 - .0) / .01)) + 1, endpoint=True)
        self.maxDets = [20]
        self.areaRng = [
            [0 ** 2, 1e5 ** 2], [32 ** 2, 96 ** 2], [96 ** 2, 1e5 ** 2]]
        self.areaRngLbl = ['all', 'medium', 'large']
        self.kpt_oks_sigmas = COCO_SIGMAS_17


class OracleCOCOeval:
    """gt: dict with 'images' and 'annotations' (person_keypoints schema);
    dt: list of result dicts {image_id, keypoints, score} (loadRes-style
    area/id assignment happens here, as pycocotools.COCO.loadRes does)."""

    def __init__(self, gt: dict, dt: list, sigmas=None):
        self.params = OracleParams()
        if sigmas is not None:
            self.params.kpt_oks_sigmas = np.asarray(sigmas)
        self.imgIds = sorted({im['id'] for im in gt['images']})

        self._gts = defaultdict(list)
        for ann in gt.get('annotations', []):
            if ann.get('category_id', 1) != 1:
                continue
            g = dict(ann)
            # COCO._prepare: ignore = iscrowd; keypoints: or num_keypoints==0
            g['ignore'] = g['ignore'] if 'ignore' in g else 0
            g['ignore'] = 'iscrowd' in g and g['iscrowd']
            vg = np.asarray(g['keypoints'][2::3])
            if 'num_keypoints' not in g:
                g['num_keypoints'] = int(np.count_nonzero(vg > 0))
            g['ignore'] = (g['num_keypoints'] == 0) or g['ignore']
            self._gts[g['image_id']].append(g)

        self._dts = defaultdict(list)
        for i, det in enumerate(dt):
            d = dict(det)
            # COCO.loadRes keypoint-results branch
            s = np.asarray(d['keypoints'], dtype=np.float64)
            x, y = s[0::3], s[1::3]
            x0, x1, y0, y1 = np.min(x), np.max(x), np.min(y), np.max(y)
            d['area'] = (x1 - x0) * (y1 - y0)
            d['bbox'] = [x0, y0, x1 - x0, y1 - y0]
            d['id'] = i + 1
            self._dts[d['image_id']].append(d)

    # -- COCOeval.computeOks, verbatim structure --------------------------
    def computeOks(self, imgId):
        p = self.params
        gts = self._gts[imgId]
        dts = self._dts[imgId]
        inds = np.argsort([-d['score'] for d in dts], kind='mergesort')
        dts = [dts[i] for i in inds]
        if len(dts) > p.maxDets[-1]:
            dts = dts[0:p.maxDets[-1]]
        if len(gts) == 0 or len(dts) == 0:
            return []
        ious = np.zeros((len(dts), len(gts)))
        sigmas = p.kpt_oks_sigmas
        vars = (sigmas * 2) ** 2
        k = len(sigmas)
        for j, gt in enumerate(gts):
            g = np.array(gt['keypoints'])
            xg = g[0::3]; yg = g[1::3]; vg = g[2::3]
            k1 = np.count_nonzero(vg > 0)
            bb = gt['bbox']
            x0 = bb[0] - bb[2]; x1 = bb[0] + bb[2] * 2
            y0 = bb[1] - bb[3]; y1 = bb[1] + bb[3] * 2
            for i, dt in enumerate(dts):
                d = np.array(dt['keypoints'])
                xd = d[0::3]; yd = d[1::3]
                if k1 > 0:
                    dx = xd - xg
                    dy = yd - yg
                else:
                    z = np.zeros((k))
                    dx = np.max((z, x0 - xd), axis=0) \
                        + np.max((z, xd - x1), axis=0)
                    dy = np.max((z, y0 - yd), axis=0) \
                        + np.max((z, yd - y1), axis=0)
                e = (dx ** 2 + dy ** 2) / vars \
                    / (gt['area'] + np.spacing(1)) / 2
                if k1 > 0:
                    e = e[vg > 0]
                ious[i, j] = np.sum(np.exp(-e)) / e.shape[0]
        return ious

    # -- COCOeval.evaluateImg, verbatim structure -------------------------
    def evaluateImg(self, imgId, aRng, maxDet):
        p = self.params
        gt = self._gts[imgId]
        dt = self._dts[imgId]
        if len(gt) == 0 and len(dt) == 0:
            return None

        for g in gt:
            if g['ignore'] or (g['area'] < aRng[0] or g['area'] > aRng[1]):
                g['_ignore'] = 1
            else:
                g['_ignore'] = 0
        gtind = np.argsort([g['_ignore'] for g in gt], kind='mergesort')
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d['score'] for d in dt], kind='mergesort')
        dt = [dt[i] for i in dtind[0:maxDet]]
        iscrowd = [int(o.get('iscrowd', 0)) for o in gt]
        ious = self.ious[imgId][:, gtind] \
            if len(self.ious[imgId]) > 0 else self.ious[imgId]

        T = len(p.iouThrs)
        G = len(gt)
        D = len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g['_ignore'] for g in gt])
        dtIg = np.zeros((T, D))
        if not len(ious) == 0:
            for tind, t in enumerate(p.iouThrs):
                for dind, d in enumerate(dt):
                    iou = min([t, 1 - 1e-10])
                    m = -1
                    for gind, g in enumerate(gt):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = gt[m]['id']
                    gtm[tind, m] = d['id']
        a = np.array([d['area'] < aRng[0] or d['area'] > aRng[1]
                      for d in dt]).reshape((1, len(dt)))
        dtIg = np.logical_or(dtIg, np.logical_and(
            dtm == 0, np.repeat(a, T, 0)))
        return {
            'dtMatches': dtm,
            'dtScores': [d['score'] for d in dt],
            'gtIgnore': gtIg,
            'dtIgnore': dtIg,
        }

    def evaluate(self):
        self.ious = {imgId: self.computeOks(imgId) for imgId in self.imgIds}
        maxDet = self.params.maxDets[-1]
        self.evalImgs = [
            self.evaluateImg(imgId, areaRng, maxDet)
            for areaRng in self.params.areaRng
            for imgId in self.imgIds
        ]

    # -- COCOeval.accumulate, verbatim structure --------------------------
    def accumulate(self):
        p = self.params
        T = len(p.iouThrs)
        R = len(p.recThrs)
        A = len(p.areaRng)
        M = len(p.maxDets)
        precision = -np.ones((T, R, 1, A, M))
        recall = -np.ones((T, 1, A, M))
        I0 = len(self.imgIds)
        for a in range(A):
            Na = a * I0
            for m, maxDet in enumerate(p.maxDets):
                E = [self.evalImgs[Na + i] for i in range(I0)]
                E = [e for e in E if e is not None]
                if len(E) == 0:
                    continue
                dtScores = np.concatenate(
                    [e['dtScores'][0:maxDet] for e in E])
                inds = np.argsort(-dtScores, kind='mergesort')
                dtm = np.concatenate(
                    [e['dtMatches'][:, 0:maxDet] for e in E], axis=1
                )[:, inds]
                dtIg = np.concatenate(
                    [e['dtIgnore'][:, 0:maxDet] for e in E], axis=1
                )[:, inds]
                gtIg = np.concatenate([e['gtIgnore'] for e in E])
                npig = np.count_nonzero(gtIg == 0)
                if npig == 0:
                    continue
                tps = np.logical_and(dtm, np.logical_not(dtIg))
                fps = np.logical_and(
                    np.logical_not(dtm), np.logical_not(dtIg))
                tp_sum = np.cumsum(tps, axis=1).astype(dtype=np.float64)
                fp_sum = np.cumsum(fps, axis=1).astype(dtype=np.float64)
                for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                    tp = np.array(tp)
                    fp = np.array(fp)
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    q = np.zeros((R,))
                    if nd:
                        recall[t, 0, a, m] = rc[-1]
                    else:
                        recall[t, 0, a, m] = 0
                    pr = pr.tolist()
                    q = q.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds = np.searchsorted(rc, p.recThrs, side='left')
                    try:
                        for ri, pi in enumerate(inds):
                            q[ri] = pr[pi]
                    except Exception:
                        pass
                    precision[t, :, 0, a, m] = np.array(q)
        self._precision = precision
        self._recall = recall

    # -- COCOeval.summarize (_summarizeKps) -------------------------------
    def summarize(self):
        p = self.params

        def _summarize(ap=1, iouThr=None, areaRng='all', maxDets=20):
            aind = [i for i, a in enumerate(p.areaRngLbl) if a == areaRng]
            mind = [i for i, m in enumerate(p.maxDets) if m == maxDets]
            if ap == 1:
                s = self._precision
                if iouThr is not None:
                    t = np.where(iouThr == p.iouThrs)[0]
                    s = s[t]
                s = s[:, :, :, aind, mind]
            else:
                s = self._recall
                if iouThr is not None:
                    t = np.where(iouThr == p.iouThrs)[0]
                    s = s[t]
                s = s[:, :, aind, mind]
            if len(s[s > -1]) == 0:
                mean_s = -1
            else:
                mean_s = np.mean(s[s > -1])
            return mean_s

        stats = np.zeros((10,))
        stats[0] = _summarize(1, maxDets=20)
        stats[1] = _summarize(1, maxDets=20, iouThr=.5)
        stats[2] = _summarize(1, maxDets=20, iouThr=.75)
        stats[3] = _summarize(1, maxDets=20, areaRng='medium')
        stats[4] = _summarize(1, maxDets=20, areaRng='large')
        stats[5] = _summarize(0, maxDets=20)
        stats[6] = _summarize(0, maxDets=20, iouThr=.5)
        stats[7] = _summarize(0, maxDets=20, iouThr=.75)
        stats[8] = _summarize(0, maxDets=20, areaRng='medium')
        stats[9] = _summarize(0, maxDets=20, areaRng='large')
        self.stats = stats
        return stats

    def run(self):
        self.evaluate()
        self.accumulate()
        return self.summarize()
