"""Weighted-merge NMS tests (det_util.non_max_suppression semantics)."""

import numpy as np

from yolat_tpu.eval.merge_nms import merge_nms


class TestMergeNMS:
    def test_merges_overlapping_same_class(self):
        boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                         float)
        obj = np.array([0.9, 0.6, 0.8])
        cls = np.zeros((3, 2))
        cls[:, 0] = 1.0
        out = merge_nms(boxes, obj, cls, conf_thres=0.5, nms_thres=0.4)
        assert len(out["boxes"]) == 2
        # first kept box is the confidence-weighted mean of boxes 0 and 1
        want = (0.9 * boxes[0] + 0.6 * boxes[1]) / 1.5
        np.testing.assert_allclose(out["boxes"][0], want)

    def test_different_classes_not_merged(self):
        boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], float)
        obj = np.array([0.9, 0.8])
        cls = np.array([[1.0, 0.0], [0.0, 1.0]])
        out = merge_nms(boxes, obj, cls, conf_thres=0.5, nms_thres=0.4)
        assert len(out["boxes"]) == 2

    def test_conf_threshold(self):
        boxes = np.array([[0, 0, 10, 10]], float)
        out = merge_nms(boxes, np.array([0.3]), np.ones((1, 1)),
                        conf_thres=0.5)
        assert len(out["boxes"]) == 0

    def test_score_order(self):
        boxes = np.array([[0, 0, 10, 10], [100, 0, 110, 10]], float)
        obj = np.array([0.6, 0.9])
        cls = np.ones((2, 1))
        out = merge_nms(boxes, obj, cls, conf_thres=0.5)
        assert out["obj_conf"][0] == 0.9
