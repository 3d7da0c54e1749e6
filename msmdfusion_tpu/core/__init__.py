from . import anchors, box_modes, boxes, coders, gaussian, iou3d, nms  # noqa: F401
