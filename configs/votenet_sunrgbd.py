"""VoteNet on SUNRGBD 10-class (indoor zoo).

Mirrors reference configs/votenet/votenet_16x8_sunrgbd-3d-10class.py +
configs/_base_/datasets/sunrgbd-3d-10class.py.
"""
class_names = ('bed', 'table', 'sofa', 'chair', 'toilet', 'desk', 'dresser',
               'night_stand', 'bookshelf', 'bathtub')
dataset_type = 'SUNRGBDDataset'
data_root = 'data/sunrgbd/'
num_points = 20000

train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='DEPTH', shift_height=True,
         load_dim=6, use_dim=[0, 1, 2]),
    dict(type='LoadAnnotations3D'),
    dict(type='RandomFlip3D', sync_2d=False, flip_ratio_bev_horizontal=0.5),
    dict(type='GlobalRotScaleTrans', rot_range=[-0.523599, 0.523599],
         scale_ratio_range=[0.85, 1.15], shift_height=True),
    dict(type='IndoorPointSample', num_points=num_points),
    dict(type='PadGroundTruth', max_gt=64),
    dict(type='FormatBundle3D', class_names=class_names),
]
test_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='DEPTH', shift_height=True,
         load_dim=6, use_dim=[0, 1, 2]),
    dict(type='IndoorPointSample', num_points=num_points),
    dict(type='FormatBundle3D', class_names=class_names, with_label=False),
]
data = dict(
    samples_per_gpu=16,
    workers_per_gpu=4,
    train=dict(type=dataset_type, data_root=data_root,
               ann_file=data_root + 'sunrgbd_infos_train.pkl',
               pipeline=train_pipeline, classes=class_names,
               filter_empty_gt=False, box_type_3d='Depth'),
    val=dict(type=dataset_type, data_root=data_root,
             ann_file=data_root + 'sunrgbd_infos_val.pkl',
             pipeline=test_pipeline, classes=class_names, test_mode=True,
             box_type_3d='Depth'),
    test=dict(type=dataset_type, data_root=data_root,
              ann_file=data_root + 'sunrgbd_infos_val.pkl',
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
        type='VoteHead', num_classes=10, in_channels=256, num_proposals=256,
        num_dir_bins=12, aggregation_radius=0.3, aggregation_samples=16,
        mean_sizes=[[2.114256, 1.620300, 0.927272],
                    [0.791118, 1.279516, 0.718182],
                    [0.923508, 1.867419, 0.845495],
                    [0.591958, 0.552978, 0.827272],
                    [0.699104, 0.454178, 0.75625],
                    [0.69519, 1.346299, 0.736364],
                    [0.528526, 1.002642, 1.172878],
                    [0.500618, 0.632163, 0.683424],
                    [0.404671, 1.071108, 1.688889],
                    [0.76584, 1.398258, 0.472728]]),
    train_cfg=dict(pos_distance_thr=0.3, neg_distance_thr=0.6,
                   sample_mod='vote'),
    test_cfg=dict(sample_mod='seed', nms_thr=0.25, score_thr=0.05,
                  per_class_proposal=True))

optimizer = dict(type='AdamW', lr=0.008, weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=10, norm_type=2))
lr_config = dict(policy='step', warmup=None, step=[24, 32])
total_epochs = 36
log_config = dict(interval=30)
checkpoint_config = dict(interval=1)
