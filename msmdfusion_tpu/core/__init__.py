from . import anchors, boxes, coders, gaussian, iou3d, nms  # noqa: F401
