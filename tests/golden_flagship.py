"""Golden-box regression fixture for the flagship architecture.

VERDICT r4 item 5: freeze a trained tiny-flagship checkpoint + its decoded
boxes as a fixture, and assert bit-stable decode across refactors — the
anti-regression net for the conv-engine perf work (reference test pattern:
the golden-value asserts of tests/test_utils, SURVEY §4).

The fixture stores only the NON-IMAGE params/batch-stats: the image branch
is frozen during training (``frozen_predicates``), so its weights never
leave their seeded init and are regenerated exactly from
``jax.random.PRNGKey(0)`` at load time — keeping the on-disk fixture a few
MB instead of the 45 MB a ResNet18 would add.

Regenerate (after an INTENTIONAL numeric change, CPU only — the fixture is
platform-pinned to the XLA:CPU the test tier runs on):

    JAX_PLATFORMS=cpu python tests/golden_flagship.py generate
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'data',
                       'golden_flagship.npz')
PCR = [-25.6, -25.6, -5.0, 25.6, 25.6, 3.0]
VOX = [0.4, 0.4, 0.2]
GRID = 128
SHAPE = dict(n=16000, v=2, m=1500, mr=1000, img_hw=(128, 224), pcr=PCR)
TRAIN_SEEDS = (11, 12)
EVAL_SEED = 3
STEPS = 40
FROZEN = ('backbone_img', 'neck_img')


def golden_config():
    """CPU-trainable flagship architecture (half the A/B test's channels)."""
    enc_caps = [7000, 5000, 3500, 2500]
    gma_caps = [8000, 6000, 4000, 3000]
    return dict(
        type='MSMDFusionDetector',
        freeze_img=True,
        spatial_shapes=[[41, GRID, GRID], [21, GRID // 2, GRID // 2],
                        [11, GRID // 4, GRID // 4],
                        [5, GRID // 8, GRID // 8]],
        downscale_factors=[1, 2, 4, 8],
        fps_num_list=[1024, 1024, 512, 512],
        radius_list=[6, 3, 2, 1],
        max_cluster_samples_list=[200, 100, 50, 25],
        dist_thresh_list=[5.0, 2.5, 1.3, 0.7],
        fg_max_voxels=[3000, 2500, 2000, 1500],
        img_backbone=dict(type='ResNet', depth=18, num_stages=4,
                          out_indices=(0, 1, 2, 3), frozen_stages=1,
                          norm_eval=True),
        img_neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                      out_channels=256, num_outs=5),
        pts_voxel_layer=dict(max_num_points=10, voxel_size=VOX,
                             max_voxels=(7000, 7000),
                             point_cloud_range=PCR),
        pts_voxel_encoder=dict(type='HardSimpleVFE', num_features=5),
        pts_middle_encoder=dict(
            type='SparseEncoder', in_channels=5, base_channels=8,
            sparse_shape=[41, GRID, GRID], output_channels=64,
            encoder_channels=((8, 8, 16), (16, 16, 32), (32, 32, 64),
                              (64, 64)),
            encoder_paddings=((0, 0, 1), (0, 0, 1), (0, 0, (0, 1, 1)),
                              (0, 0)),
            block_type='basicblock', stage_capacities=enc_caps),
        multimodal_middle_encoder=dict(
            type='SparseMultiModalEncoderPaint',
            in_channels_3D=(8, 16, 32, 64),
            in_channels_2D=(64, 64, 64, 64),
            out_channels=(16, 32, 64, 64),
            padding=(1, 1, (0, 1, 1), 0),
            stage_capacities=gma_caps),
        pts_backbone=dict(type='SECOND', in_channels=256,
                          out_channels=[32, 64], layer_nums=[2, 2],
                          layer_strides=[1, 2]),
        pts_neck=dict(type='SECONDFPN', in_channels=[32, 64],
                      out_channels=[64, 64], upsample_strides=[1, 2],
                      use_conv_for_no_stride=True),
        pts_bbox_head=dict(
            type='TransFusionHead', num_proposals=32, auxiliary=True,
            in_channels=128, hidden_channel=32, num_classes=10,
            num_decoder_layers=1, num_heads=4, nms_kernel_size=3,
            ffn_channel=64, dropout=0.0,
            common_heads=dict(center=(2, 2), height=(1, 2), dim=(3, 2),
                              rot=(2, 2), vel=(2, 2)),
            bbox_coder=dict(
                type='TransFusionBBoxCoder', pc_range=PCR[:2],
                voxel_size=VOX[:2], out_size_factor=8,
                post_center_range=[-28, -28, -10, 28, 28, 10],
                score_threshold=0.0, code_size=10)),
        train_cfg=dict(pts=dict(
            dataset='nuScenes',
            assigner=dict(
                type='HungarianAssigner3D',
                cls_cost=dict(gamma=2, alpha=0.25, weight=0.15),
                reg_cost=dict(weight=0.25), iou_cost=dict(weight=0.25)),
            pos_weight=-1, gaussian_overlap=0.1, min_radius=2,
            grid_size=[GRID, GRID, 40], voxel_size=VOX, out_size_factor=8,
            code_weights=[1.0] * 8 + [0.2, 0.2], point_cloud_range=PCR)),
        test_cfg=dict(pts=dict(
            dataset='nuScenes', grid_size=[GRID, GRID, 40],
            out_size_factor=8, pc_range=PCR[:2], voxel_size=VOX[:2],
            nms_type=None)))


def _is_img(path_key: str) -> bool:
    return any(p in path_key for p in FROZEN)


def flatten(tree):
    from flax.traverse_util import flatten_dict
    return {'|'.join(k): np.asarray(v)
            for k, v in flatten_dict(tree).items()}


def unflatten(flat):
    from flax.traverse_util import unflatten_dict
    return unflatten_dict({tuple(k.split('|')): v for k, v in flat.items()})


def build_model():
    from msmdfusion_tpu.models.builder import build_detector
    import msmdfusion_tpu.models  # noqa: F401
    return build_detector(golden_config())


def seeded_init(model, batch):
    import jax
    return jax.jit(model.init)(jax.random.PRNGKey(0), batch['points'],
                               batch['points_mask'], batch['img'],
                               batch['fg'])


def eval_batch():
    from msmdfusion_tpu.utils.synth_scene import realistic_batch
    return realistic_batch(SHAPE, b=1, seed=EVAL_SEED)


def load_variables(model, batch):
    """Fixture params/stats + seeded-init image branch -> variables dict."""
    import jax  # noqa: F401
    data = dict(np.load(FIXTURE, allow_pickle=False))
    init = seeded_init(model, batch)
    flat = flatten({'params': init['params'],
                    'batch_stats': init.get('batch_stats', {})})
    n_spliced = 0
    for k, v in data.items():
        if k.startswith(('params|', 'batch_stats|')):
            assert k in flat, f'fixture key {k} missing from model: rebuild?'
            assert flat[k].shape == v.shape, (k, flat[k].shape, v.shape)
            # params are stored f16 (size) — the goldens were decoded from
            # exactly these f16-rounded values
            flat[k] = v.astype(np.float32)
            n_spliced += 1
    assert n_spliced > 50, n_spliced
    tree = unflatten(flat)
    return {'params': tree['params'], 'batch_stats': tree['batch_stats']}


def decode(model, variables, batch):
    import jax

    @jax.jit
    def forward(points, points_mask, img, fg):
        preds = model.apply(variables, points, points_mask, img, fg,
                            train=False)
        return model.apply(variables, preds, method=type(model).get_bboxes)

    res = forward(batch['points'], batch['points_mask'], batch['img'],
                  batch['fg'])
    return {k: np.asarray(v) for k, v in res.items()}


def generate():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from msmdfusion_tpu.apis.train import (build_lr_schedule,
                                           build_optimizer, make_train_step)
    from msmdfusion_tpu.utils.synth_scene import realistic_batch

    model = build_model()
    batches = [realistic_batch(SHAPE, b=1, seed=s, return_gt=True)
               for s in TRAIN_SEEDS]
    b0 = batches[0]
    variables = seeded_init(model, b0)
    params, batch_stats = variables['params'], variables.get(
        'batch_stats', {})
    lr = build_lr_schedule(dict(policy='step', warmup='linear',
                                warmup_iters=10, warmup_ratio=0.1,
                                step=[]), 3e-4, STEPS, STEPS)
    tx = build_optimizer(dict(type='AdamW', lr=3e-4, weight_decay=0.01),
                         dict(grad_clip=dict(max_norm=10)), lr,
                         params=params, frozen_predicates=FROZEN)
    opt_state = tx.init(params)
    train_step = jax.jit(make_train_step(model, tx,
                                         rng_key=jax.random.PRNGKey(0),
                                         frozen_predicates=FROZEN))
    device_batches = [
        {'inputs': (bb['points'], bb['points_mask'], bb['img'], bb['fg']),
         'gt_bboxes': bb['gt']['gt_bboxes'],
         'gt_labels': bb['gt']['gt_labels'],
         'gt_valid': bb['gt']['gt_valid']} for bb in batches]
    losses = []
    for i in range(STEPS):
        params, batch_stats, opt_state, metrics = train_step(
            params, batch_stats, opt_state, device_batches[i % 2], i)
        losses.append(float(metrics['total_loss']))
        if i % 5 == 0:
            print(f'step {i}: loss={losses[-1]:.4f}', flush=True)
    assert np.mean(losses[-5:]) < 0.8 * np.mean(losses[:5]), losses

    # store non-image params as f16 (halves the fixture) and decode the
    # goldens from the SAME f16-rounded weights so fixture and test agree
    import jax.numpy as jnp

    def round_f16(path, leaf):
        key = '|'.join(str(getattr(k, 'key', k)) for k in path)
        if _is_img(key) or leaf.dtype != np.float32:
            return leaf
        return leaf.astype(jnp.float16).astype(jnp.float32)

    params = jax.tree_util.tree_map_with_path(round_f16,
                                              jax.device_get(params))
    flat = flatten({'params': params,
                    'batch_stats': jax.device_get(batch_stats)})
    keep = {k: (v.astype(np.float16)
                if k.startswith('params|') and v.dtype == np.float32
                else v)
            for k, v in flat.items() if not _is_img(k)}
    be = eval_batch()
    boxes = decode(model, {'params': params, 'batch_stats': batch_stats},
                   be)
    out = dict(keep)
    for k, v in boxes.items():
        out[f'golden|{k}'] = v
    np.savez_compressed(FIXTURE, **out)
    mb = os.path.getsize(FIXTURE) / 1e6
    print(f'wrote {FIXTURE} ({mb:.1f} MB, {len(keep)} param leaves, '
          f'loss {losses[0]:.3f} -> {losses[-1]:.3f})')


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == 'generate':
        generate()
    else:
        print(__doc__)
