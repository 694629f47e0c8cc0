"""Op-library tests: segment reductions vs numpy, IoU conventions, NMS vs a
greedy host reference, kNN graphs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolat_tpu.ops.iou import box_iou_matrix, inflate_boxes
from yolat_tpu.ops.knn import knn_graph
from yolat_tpu.ops.nms import single_image_nms
from yolat_tpu.ops.segment import (
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)


class TestSegment:
    def setup_method(self, _):
        rng = np.random.default_rng(1)
        self.data = rng.normal(size=(40, 8)).astype(np.float32)
        self.seg = rng.integers(0, 6, size=40)
        self.mask = rng.random(40) > 0.3

    def _np_reduce(self, fn, fill):
        out = np.full((8, self.data.shape[1]), fill, np.float32)
        for s in range(8):
            rows = self.data[(self.seg == s) & self.mask]
            if len(rows):
                out[s] = fn(rows, axis=0)
        return out

    def test_mean(self):
        got = segment_mean(jnp.array(self.data), jnp.array(self.seg), 8,
                           mask=jnp.array(self.mask))
        np.testing.assert_allclose(got, self._np_reduce(np.mean, 0.0), rtol=2e-5)

    def test_sum(self):
        got = segment_sum(jnp.array(self.data), jnp.array(self.seg), 8,
                          mask=jnp.array(self.mask))
        np.testing.assert_allclose(got, self._np_reduce(np.sum, 0.0), rtol=2e-5)

    def test_max_empty_segments_zero(self):
        got = segment_max(jnp.array(self.data), jnp.array(self.seg), 8,
                          mask=jnp.array(self.mask))
        np.testing.assert_allclose(got, self._np_reduce(np.max, 0.0), rtol=2e-5)
        # segments 6, 7 never appear -> torch_scatter zero convention
        np.testing.assert_array_equal(np.asarray(got[6:]), 0.0)

    def test_softmax_sums_to_one(self):
        got = segment_softmax(jnp.array(self.data), jnp.array(self.seg), 8,
                              mask=jnp.array(self.mask))
        got = np.asarray(got)
        for s in range(6):
            sel = (self.seg == s) & self.mask
            if sel.any():
                np.testing.assert_allclose(got[sel].sum(axis=0), 1.0, rtol=1e-5)
        assert not np.isnan(got).any()


class TestIoU:
    def test_plus1_convention(self):
        a = jnp.array([[0.0, 0.0, 9.0, 9.0]])
        got = box_iou_matrix(a, a, plus1=True)
        np.testing.assert_allclose(got, 1.0)
        b = jnp.array([[9.0, 9.0, 19.0, 19.0]])
        # +1 convention: boxes sharing only the corner pixel (9,9) intersect
        # by exactly that one pixel
        got = box_iou_matrix(a, b, plus1=True)
        assert 0 < float(got[0, 0]) < 0.1

    def test_no_plus1(self):
        a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
        b = jnp.array([[1.0, 1.0, 3.0, 3.0]])
        np.testing.assert_allclose(box_iou_matrix(a, b), 1.0 / 7.0, rtol=1e-6)

    def test_inflate(self):
        b = jnp.array([[0.0, 0.0, 2.0, 2.0]])
        out = np.asarray(inflate_boxes(b, 1.05))
        np.testing.assert_allclose(out, [[-0.05, -0.05, 2.05, 2.05]], atol=1e-6)


def host_nms(boxes, scores, iou_th):
    """Greedy torchvision-semantics NMS on host."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    alive = np.ones(len(boxes), bool)
    for i in order:
        if not alive[i]:
            continue
        keep.append(i)
        ix0 = np.maximum(boxes[i, 0], boxes[:, 0])
        iy0 = np.maximum(boxes[i, 1], boxes[:, 1])
        ix1 = np.minimum(boxes[i, 2], boxes[:, 2])
        iy1 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(ix1 - ix0, 0, None) * np.clip(iy1 - iy0, 0, None)
        a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / (a1 + a2 - inter + 1e-16)
        alive &= ~(iou > iou_th)
    return keep


class TestNMS:
    @pytest.mark.parametrize("algorithm", ["fixpoint", "loop", "classfix"])
    def test_single_class_matches_host(self, algorithm):
        rng = np.random.default_rng(0)
        M = 24
        xy = rng.uniform(0, 90, size=(M, 2))
        wh = rng.uniform(8, 25, size=(M, 2))
        boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
        scores = rng.uniform(0.05, 1.0, size=M).astype(np.float32)

        out = single_image_nms(
            jnp.array(boxes),
            jnp.array(scores[:, None]),  # one class
            jnp.ones(M, jnp.float32),
            jnp.ones(M, bool),
            iou_thres=0.5,
            max_det=32,
            algorithm=algorithm,
        )
        got_valid = np.asarray(out["valid"])
        got_boxes = np.asarray(out["boxes"])[got_valid]
        want = host_nms(boxes, scores, 0.5)
        np.testing.assert_allclose(got_boxes, boxes[want], rtol=1e-6)

    @pytest.mark.parametrize("alg", ["fixpoint", "classfix"])
    @pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
    def test_fixpoint_equals_loop_fuzz(self, seed, alg):
        """The matrix fixed-point NMS is the exact greedy solution: same
        detections (boxes, scores, classes, order) as the sequential loop on
        dense multi-class candidates with heavy overlap."""
        rng = np.random.default_rng(seed)
        M, K = 60, 3
        xy = rng.uniform(0, 60, size=(M, 2))
        wh = rng.uniform(10, 40, size=(M, 2))
        boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
        cls = rng.uniform(0, 1, size=(M, K)).astype(np.float32)
        obj = rng.uniform(0.1, 1, size=M).astype(np.float32)
        valid = rng.uniform(size=M) > 0.1

        kw = dict(iou_thres=0.45, max_det=64)
        a = single_image_nms(jnp.array(boxes), jnp.array(cls),
                             jnp.array(obj), jnp.array(valid),
                             algorithm=alg, **kw)
        b = single_image_nms(jnp.array(boxes), jnp.array(cls),
                             jnp.array(obj), jnp.array(valid),
                             algorithm="loop", **kw)
        va, vb = np.asarray(a["valid"]), np.asarray(b["valid"])
        assert va.sum() == vb.sum()
        np.testing.assert_allclose(np.asarray(a["boxes"])[va],
                                   np.asarray(b["boxes"])[vb], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(a["scores"])[va],
                                   np.asarray(b["scores"])[vb], rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(a["classes"])[va],
                                      np.asarray(b["classes"])[vb])

    def test_class_offset_prevents_cross_class_suppression(self):
        boxes = np.array([[0, 0, 10, 10], [1, 1, 10, 10]], np.float32)
        # identical boxes, different argmax classes
        cls = np.array([[0.9, 0.0], [0.0, 0.8]], np.float32)
        out = single_image_nms(
            jnp.array(boxes), jnp.array(cls), jnp.ones(2, jnp.float32),
            jnp.ones(2, bool), iou_thres=0.5, max_det=8,
        )
        assert int(np.asarray(out["valid"]).sum()) == 2
        assert set(np.asarray(out["classes"])[np.asarray(out["valid"])]) == {0, 1}

    def test_multilabel_candidates(self):
        # one box with two strong classes -> two detections (multi_label
        # semantics of train.py:81-82)
        boxes = np.array([[0, 0, 10, 10]], np.float32)
        cls = np.array([[0.9, 0.8]], np.float32)
        out = single_image_nms(
            jnp.array(boxes), jnp.array(cls), jnp.ones(1, jnp.float32),
            jnp.ones(1, bool), iou_thres=0.5, max_det=8,
        )
        assert int(np.asarray(out["valid"]).sum()) == 2

    def test_padding_ignored(self):
        boxes = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
        cls = np.array([[0.9], [0.9]], np.float32)
        valid = np.array([True, False])
        out = single_image_nms(
            jnp.array(boxes), jnp.array(cls), jnp.ones(2, jnp.float32),
            jnp.array(valid), iou_thres=0.5, max_det=8,
        )
        assert int(np.asarray(out["valid"]).sum()) == 1

    def test_max_det_cap(self):
        rng = np.random.default_rng(3)
        M = 20
        xy = rng.uniform(0, 1000, size=(M, 2))  # disjoint boxes
        boxes = np.concatenate([xy, xy + 5], axis=1).astype(np.float32)
        cls = rng.uniform(0.1, 1, size=(M, 1)).astype(np.float32)
        out = single_image_nms(
            jnp.array(boxes), jnp.array(cls), jnp.ones(M, jnp.float32),
            jnp.ones(M, bool), iou_thres=0.5, max_det=4,
        )
        assert int(np.asarray(out["valid"]).sum()) == 4
        # highest scores kept
        kept = np.asarray(out["scores"])[np.asarray(out["valid"])]
        np.testing.assert_allclose(np.sort(kept), np.sort(cls[:, 0])[-4:], rtol=1e-6)


class TestKNN:
    def test_segment_restriction(self):
        """segment_ids keep kNN within each packed image (knn_matrix
        per-sample batch semantics, torch_edge.py:66-99)."""
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.normal(size=(24, 3)).astype(np.float32))
        seg = jnp.asarray(np.repeat(np.arange(3), 8))
        from yolat_tpu.ops.knn import knn_graph

        edge, emask = knn_graph(x, k=4, segment_ids=seg)
        src, dst = np.asarray(edge[0]), np.asarray(edge[1])
        m = np.asarray(emask)
        assert m.sum() > 0
        assert (np.asarray(seg)[src[m]] == np.asarray(seg)[dst[m]]).all()
        # tiny segment (< k members): cross picks masked, not emitted
        seg2 = jnp.asarray(np.array([0, 0] + [1] * 22))
        edge2, emask2 = knn_graph(x, k=4, segment_ids=seg2)
        s2, d2 = np.asarray(edge2[0]), np.asarray(edge2[1])
        m2 = np.asarray(emask2)
        assert (np.asarray(seg2)[s2[m2]] == np.asarray(seg2)[d2[m2]]).all()

    def test_matches_bruteforce(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(20, 3)).astype(np.float32)
        edge, mask = knn_graph(jnp.array(x), k=4)
        edge = np.asarray(edge)
        for i in range(20):
            d = np.linalg.norm(x - x[i], axis=1)
            d[i] = np.inf
            want = set(np.argsort(d)[:4].tolist())
            got = set(edge[0, edge[1] == i].tolist())
            assert got == want

    def test_masked_points_excluded(self):
        x = np.zeros((6, 2), np.float32)
        x[:, 0] = np.arange(6)
        mask = np.array([True, True, True, True, False, False])
        edge, emask = knn_graph(jnp.array(x), k=2, mask=jnp.array(mask))
        edge, emask = np.asarray(edge), np.asarray(emask)
        # no valid edge touches masked points
        valid_edges = edge[:, emask]
        assert (valid_edges < 4).all()


class TestClassfixTies:
    def test_duplicate_boxes_equal_scores_keep_one(self):
        """Bit-equal scores on identical boxes: classfix breaks the tie by
        lower index, matching the loop oracle (torchvision index order)."""
        boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [40, 40, 50, 50]],
                         np.float32)
        cls = np.array([[0.7], [0.7], [0.3]], np.float32)
        for alg in ("classfix", "loop"):
            out = single_image_nms(
                jnp.array(boxes), jnp.array(cls), jnp.ones(3, jnp.float32),
                jnp.ones(3, bool), iou_thres=0.5, max_det=8, algorithm=alg)
            v = np.asarray(out["valid"])
            assert v.sum() == 2, alg
            kept = np.asarray(out["boxes"])[v]
            # one of the duplicates plus the distinct box
            assert (kept == boxes[0]).all(1).sum() == 1, alg

    def test_negative_scores_not_falsely_suppressed(self):
        """conf_thres < 0 admits negative-score candidates; an isolated one
        must survive (the suppression reduction may not assume positive
        scores)."""
        boxes = np.array([[0, 0, 10, 10], [100, 100, 110, 110]], np.float32)
        cls = np.array([[0.9], [-0.2]], np.float32)
        out = single_image_nms(
            jnp.array(boxes), jnp.array(cls), jnp.ones(2, jnp.float32),
            jnp.ones(2, bool), iou_thres=0.5, max_det=8,
            conf_thres=-0.5, algorithm="classfix")
        assert int(np.asarray(out["valid"]).sum()) == 2
