"""VoteNet on ScanNet 18-class (indoor zoo).

Mirrors reference configs/votenet/votenet_8x8_scannet-3d-18class.py +
configs/_base_/datasets/scannet-3d-18class.py with this framework's
static-shape pipeline.
"""
class_names = ('cabinet', 'bed', 'chair', 'sofa', 'table', 'door', 'window',
               'bookshelf', 'picture', 'counter', 'desk', 'curtain',
               'refrigerator', 'showercurtrain', 'toilet', 'sink',
               'bathtub', 'garbagebin')
dataset_type = 'ScanNetDataset'
data_root = 'data/scannet/'
num_points = 40000

train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='DEPTH', shift_height=True,
         load_dim=6, use_dim=[0, 1, 2]),
    dict(type='LoadAnnotations3D', with_bbox_3d=True, with_label_3d=True,
         with_mask_3d=True, with_seg_3d=True),
    dict(type='PointSegClassMapping',
         valid_cat_ids=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28,
                        33, 34, 36, 39)),
    dict(type='IndoorPointSample', num_points=num_points),
    dict(type='RandomFlip3D', sync_2d=False, flip_ratio_bev_horizontal=0.5,
         flip_ratio_bev_vertical=0.5),
    dict(type='GlobalRotScaleTrans', rot_range=[-0.087266, 0.087266],
         scale_ratio_range=[1.0, 1.0], shift_height=True),
    dict(type='PadGroundTruth', max_gt=128),
    dict(type='FormatBundle3D', class_names=class_names),
]
test_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='DEPTH', shift_height=True,
         load_dim=6, use_dim=[0, 1, 2]),
    dict(type='IndoorPointSample', num_points=num_points),
    dict(type='FormatBundle3D', class_names=class_names, with_label=False),
]
data = dict(
    samples_per_gpu=8,
    workers_per_gpu=4,
    train=dict(type=dataset_type, data_root=data_root,
               ann_file=data_root + 'scannet_infos_train.pkl',
               pipeline=train_pipeline, classes=class_names,
               filter_empty_gt=False, box_type_3d='Depth'),
    val=dict(type=dataset_type, data_root=data_root,
             ann_file=data_root + 'scannet_infos_val.pkl',
             pipeline=test_pipeline, classes=class_names, test_mode=True,
             box_type_3d='Depth'),
    test=dict(type=dataset_type, data_root=data_root,
              ann_file=data_root + 'scannet_infos_val.pkl',
              pipeline=test_pipeline, classes=class_names, test_mode=True,
              box_type_3d='Depth'))

model = dict(
    type='VoteNet',
    backbone=dict(
        type='PointNet2SASSG', in_channels=4,
        num_points=(2048, 1024, 512, 256), radius=(0.2, 0.4, 0.8, 1.2),
        num_samples=(64, 32, 16, 16),
        sa_channels=((64, 64, 128), (128, 128, 256), (128, 128, 256),
                     (128, 128, 256)),
        fp_channels=((256, 256), (256, 256))),
    bbox_head=dict(
        type='VoteHead', num_classes=18, in_channels=256, num_proposals=256,
        num_dir_bins=1,  # with_rot=False in the reference ScanNet coder
        aggregation_radius=0.3, aggregation_samples=16,
        mean_sizes=[[0.76966727, 0.8116021, 0.92573744],
                    [1.876858, 1.8425595, 1.1931566],
                    [0.61328, 0.6148609, 0.7182701],
                    [1.3955007, 1.5121545, 0.83443564],
                    [0.97949594, 1.0675149, 0.6329687],
                    [0.531663, 0.5955577, 1.7500148],
                    [0.9624706, 0.72462326, 1.1481868],
                    [0.83221924, 1.0490936, 1.6875663],
                    [0.21132214, 0.4206159, 0.5372846],
                    [1.4440073, 1.8970833, 0.26985747],
                    [1.0294262, 1.4040797, 0.87554324],
                    [1.3766412, 0.65521795, 1.6813129],
                    [0.6650819, 0.71111923, 1.298853],
                    [0.41999173, 0.37906948, 1.7513971],
                    [0.59359556, 0.5912492, 0.73919016],
                    [0.50867593, 0.50656086, 0.30136237],
                    [1.1511526, 1.0546296, 0.49706793],
                    [0.47535285, 0.49249494, 0.5802117]]),
    train_cfg=dict(pos_distance_thr=0.3, neg_distance_thr=0.6,
                   sample_mod='vote'),
    test_cfg=dict(sample_mod='seed', nms_thr=0.25, score_thr=0.05,
                  per_class_proposal=True))

# reference configs/_base_/schedules/schedule_3x.py
optimizer = dict(type='AdamW', lr=0.008, weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=10, norm_type=2))
lr_config = dict(policy='step', warmup=None, step=[24, 32])
total_epochs = 36
log_config = dict(interval=30)
checkpoint_config = dict(interval=1)
