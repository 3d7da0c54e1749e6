"""Detection-level A/B for the two documented GMA semantic deviations.

VERDICT r3 weak-3: the approx-NN (strided representatives instead of the
reference's FPS+ball-query, gma_encoder.approx_nn_3d) and the learned
dummy embedding (instead of the reference's fresh-uniform row per step,
sparse_multimodal_encoder_painting.py:372) were only ever quantified at
the *feature* level. This test measures their effect where it matters: on
the decoded boxes out of the FULL pipeline (voxelize -> encoder -> GMA ->
SECOND/FPN -> TransFusion head -> decode).

Protocol (learned from a failed first attempt): with RANDOM params the
ranked box set is chaotic — ANY epsilon perturbs top-k ordering (measured
0.1 agreement even between nearly-identical variants), so the A/B first
TRAINS a small flagship-architecture model for ~40 steps on realistic
synthetic scenes (real GT from the scene generator) until detections are
GT-driven, then runs four traced variants of the SAME trained forward on a
held-out scene:

  default     approx NN + learned dummy (the shipped path)
  exact_nn    MSMD_GMA_NN=exact      (exact-NN oracle)
  rand_dummy  MSMD_GMA_DUMMY=random  (reference's fresh-uniform row)
  jitter      default + 1mm point noise (the chaos floor: deviations must
              not disrupt the box set more than sub-sensor-noise does)

Each variant runs in its own subprocess (the env switches are read at
trace time). Matched-box agreement = fraction of variant-a's top-k
detections with a same-label BEV-IoU>=0.5 match in variant-b's top-k.
Measured values are recorded in COVERAGE.md ("GMA deviation A/B").
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the env switches are read at TRACE time; run each variant in a
# subprocess so jit caches can never leak a stale trace between variants
_WORKER = r'''
import os, sys, pickle
sys.path.insert(0, "@@REPO@@")
import numpy as np
import jax
# the axon sitecustomize re-exports JAX_PLATFORMS at interpreter start, so
# the env var alone is not enough — force CPU through jax.config (also
# keeps this CI test off the shared TPU)
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp

from msmdfusion_tpu.models.builder import build_detector
import msmdfusion_tpu.models  # noqa: F401
from msmdfusion_tpu.utils.synth_scene import realistic_batch

PCR = [-25.6, -25.6, -5.0, 25.6, 25.6, 3.0]
VOX = [0.4, 0.4, 0.2]
GRID = 128


def small_config():
    # flagship architecture at a CPU-trainable scale; NN-approximation
    # parameters scale with the coarser voxels (dist_thresh in voxel units)
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
            type='SparseEncoder', in_channels=5,
            sparse_shape=[41, GRID, GRID], output_channels=128,
            encoder_channels=((16, 16, 32), (32, 32, 64), (64, 64, 128),
                              (128, 128)),
            encoder_paddings=((0, 0, 1), (0, 0, 1), (0, 0, (0, 1, 1)),
                              (0, 0)),
            block_type='basicblock', stage_capacities=enc_caps),
        multimodal_middle_encoder=dict(
            type='SparseMultiModalEncoderPaint',
            in_channels_3D=(16, 32, 64, 128),
            in_channels_2D=(64, 64, 64, 64),
            out_channels=(32, 64, 128, 128),
            padding=(1, 1, (0, 1, 1), 0),
            stage_capacities=gma_caps),
        pts_backbone=dict(type='SECOND', in_channels=256,
                          out_channels=[64, 128], layer_nums=[2, 2],
                          layer_strides=[1, 2]),
        pts_neck=dict(type='SECONDFPN', in_channels=[64, 128],
                      out_channels=[128, 128], upsample_strides=[1, 2],
                      use_conv_for_no_stride=True),
        pts_bbox_head=dict(
            type='TransFusionHead', num_proposals=64, auxiliary=True,
            in_channels=256, hidden_channel=64, num_classes=10,
            num_decoder_layers=1, num_heads=4, nms_kernel_size=3,
            ffn_channel=128, dropout=0.0,
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


SHAPE = dict(n=16000, v=2, m=1500, mr=1000, img_hw=(128, 224), pcr=PCR)


def get_batch(seed, jitter=0.0):
    batch = realistic_batch(SHAPE, b=1, seed=seed, return_gt=True)
    if jitter:
        rng = np.random.RandomState(999)
        batch['points'] = batch['points'] + rng.normal(
            0, jitter, batch['points'].shape).astype(np.float32) * \
            np.array([1, 1, 1, 0, 0], np.float32)
    return batch


def do_train(params_path, steps):
    from msmdfusion_tpu.apis.train import (build_lr_schedule,
                                           build_optimizer, make_train_step)
    model = build_detector(small_config())
    batches = [get_batch(s) for s in (11, 12)]
    b0 = batches[0]
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        rng, b0['points'], b0['points_mask'], b0['img'], b0['fg'])
    params, batch_stats = variables['params'], variables.get(
        'batch_stats', {})
    frozen = ('backbone_img', 'neck_img')
    lr = build_lr_schedule(dict(policy='step', warmup='linear',
                                warmup_iters=10, warmup_ratio=0.1,
                                step=[]), 3e-4, steps, steps)
    tx = build_optimizer(dict(type='AdamW', lr=3e-4, weight_decay=0.01),
                         dict(grad_clip=dict(max_norm=10)), lr,
                         params=params, frozen_predicates=frozen)
    opt_state = tx.init(params)
    train_step = jax.jit(make_train_step(model, tx, rng_key=rng,
                                         frozen_predicates=frozen))
    device_batches = [
        {'inputs': (bb['points'], bb['points_mask'], bb['img'], bb['fg']),
         'gt_bboxes': bb['gt']['gt_bboxes'],
         'gt_labels': bb['gt']['gt_labels'],
         'gt_valid': bb['gt']['gt_valid']} for bb in batches]
    losses = []
    for i in range(steps):
        params, batch_stats, opt_state, metrics = train_step(
            params, batch_stats, opt_state, device_batches[i % 2], i)
        losses.append(float(metrics['total_loss']))
        if i % 5 == 0:
            print(f'step {i}: loss={losses[-1]:.4f}', flush=True)
    with open(params_path, 'wb') as f:
        pickle.dump(jax.device_get({'params': params,
                                    'batch_stats': batch_stats}), f)
    print('LOSSES', [round(v, 4) for v in losses], flush=True)


def do_forward(params_path, variant, out_path):
    if variant == 'exact_nn':
        os.environ['MSMD_GMA_NN'] = 'exact'
    elif variant == 'rand_dummy':
        os.environ['MSMD_GMA_DUMMY'] = 'random:7'
    model = build_detector(small_config())
    batch = get_batch(3, jitter=0.001 if variant == 'jitter' else 0.0)
    with open(params_path, 'rb') as f:
        variables = pickle.load(f)

    @jax.jit
    def forward(points, points_mask, img, fg):
        preds = model.apply(variables, points, points_mask, img, fg,
                            train=False)
        return model.apply(variables, preds, method=type(model).get_bboxes)

    res = forward(batch['points'], batch['points_mask'], batch['img'],
                  batch['fg'])
    np.savez(out_path, **{k: np.asarray(v) for k, v in res.items()})


mode = sys.argv[1]
if mode == 'train':
    do_train(sys.argv[2], int(sys.argv[3]))
else:
    do_forward(sys.argv[2], mode, sys.argv[3])
'''


def _run(args, timeout):
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    proc = subprocess.run(
        [sys.executable, '-c', _WORKER.replace('@@REPO@@', REPO)] + args,
        env=env, capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-4000:])
    return proc.stdout


def _agreement(a, b, top_k=20, iou_thr=0.5):
    """Fraction of variant-a's top-k detections (by score) that have a
    same-label BEV-IoU>=iou_thr match among variant b's top-k."""
    from msmdfusion_tpu.core.iou3d import boxes_iou_bev
    import jax.numpy as jnp

    def top(v):
        score = np.where(v['valid'][0].astype(bool), v['scores'][0], -1.0)
        return np.argsort(-score)[:top_k]

    sel_a, sel_b = top(a), top(b)
    ba = a['bboxes'][0][sel_a]
    bb = b['bboxes'][0][sel_b]
    la = a['labels'][0][sel_a]
    lb = b['labels'][0][sel_b]
    # boxes: [cx, cy, cz, w, l, h, yaw, ...] -> BEV IoU on (cx, cy, w, l, yaw)
    iou = np.asarray(boxes_iou_bev(jnp.asarray(ba[:, [0, 1, 3, 4, 6]]),
                                   jnp.asarray(bb[:, [0, 1, 3, 4, 6]])))
    iou = np.where(la[:, None] == lb[None, :], iou, 0.0)
    return float((iou.max(axis=1) >= iou_thr).mean())


@pytest.mark.slow
def test_gma_deviations_detection_level(tmp_path):
    params = os.path.join(str(tmp_path), 'params.pkl')
    out = _run(['train', params, '40'], timeout=3600)
    losses = json.loads(out.split('LOSSES', 1)[1].replace("'", '"'))
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert last < 0.8 * first, f'training did not converge: {losses}'

    res = {}
    for variant in ('default', 'exact_nn', 'rand_dummy', 'jitter'):
        path = os.path.join(str(tmp_path), f'{variant}.npz')
        _run([variant, params, path], timeout=1800)
        res[variant] = dict(np.load(path))

    def bidir(v, iou_thr=0.5):
        return min(_agreement(res['default'], res[v], iou_thr=iou_thr),
                   _agreement(res[v], res['default'], iou_thr=iou_thr))

    agree = {v: bidir(v) for v in ('exact_nn', 'rand_dummy', 'jitter')}
    agree07 = {v: bidir(v, iou_thr=0.7)
               for v in ('exact_nn', 'rand_dummy', 'jitter')}
    print('trained A/B top-20 bidirectional agreement vs default:',
          'iou0.5', agree, 'iou0.7', agree07,
          f'(loss {first:.3f} -> {last:.3f})')
    # The deviations must keep the ranked box set: (a) in absolute terms
    # at a TIGHT match threshold, and (b) relative to the chaos floor
    # (1mm sub-sensor jitter). Measured round-5 (recorded in COVERAGE.md
    # "GMA deviation A/B"): exact_nn 1.0, rand_dummy 1.0, jitter 1.0 at
    # BOTH IoU 0.5 and 0.7 — the deviations are box-level invisible on a
    # trained model (loss 46.3 -> 14.1).
    assert agree07['exact_nn'] >= 0.9, (agree, agree07)
    assert agree07['rand_dummy'] >= 0.9, (agree, agree07)
    assert agree07['exact_nn'] >= agree07['jitter'] - 0.1, agree07
    assert agree07['rand_dummy'] >= agree07['jitter'] - 0.1, agree07
