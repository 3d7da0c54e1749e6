from . import matching, sampling, scatter, voxelize  # noqa: F401
from .sampling import (ball_query, furthest_point_sample, gather_points,
                       group_points, knn, points_in_boxes_batch,
                       roiaware_pool3d, three_interpolate, three_nn)
from .voxelize import (dynamic_scatter, dynamic_voxelize, hard_voxelize,
                       voxelize_batch)

__all__ = ['ball_query', 'dynamic_scatter', 'dynamic_voxelize',
           'furthest_point_sample', 'gather_points', 'group_points',
           'hard_voxelize', 'knn', 'points_in_boxes_batch',
           'roiaware_pool3d', 'three_interpolate', 'three_nn',
           'voxelize_batch']
