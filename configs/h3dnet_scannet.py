"""H3DNet on ScanNet 18-class.

Mirrors reference configs/h3dnet/h3dnet_3x8_scannet-3d-18class.py: VoteNet
proposals + z/xy/line geometric-primitive heads + H3D refinement (single
shared backbone — documented simplification vs the reference's 4 towers).
"""
_base_ = 'votenet_scannet.py'

model = dict(
    type='H3DNet',
    backbone=dict(
        type='PointNet2SASSG', in_channels=4,
        num_points=(2048, 1024, 512, 256), radius=(0.2, 0.4, 0.8, 1.2),
        num_samples=(64, 32, 16, 16),
        sa_channels=((64, 64, 128), (128, 128, 256), (128, 128, 256),
                     (128, 128, 256)),
        fp_channels=((256, 256), (256, 256))),
    primitive_list=[
        dict(type='PrimitiveHead', primitive_mode=m, in_channels=256)
        for m in ('z', 'xy', 'line')],
    refine_head=dict(type='H3DBboxHead', in_channels=256, num_classes=18,
                     radius=0.5, num_samples=16))

# H3DNet schedule (reference h3dnet 3x: lr 0.008 AdamW, step [24, 32])
optimizer = dict(type='AdamW', lr=0.008, weight_decay=0.01)
