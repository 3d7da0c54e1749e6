"""Waymo Objects-bin serialization (core/evaluation/waymo_serialize.py).

The encoder is hand-rolled on the protobuf wire format; these tests
verify it against the REAL protobuf runtime (google.protobuf is
installed) by declaring the public waymo-open-dataset field numbering
(label.proto Box/Label, metrics.proto Object/Objects) as a dynamic
descriptor pool and parsing the emitted bytes with it.

Reference behavior being matched: prediction_kitti_to_waymo.py
parse_objects (:100-230) + combine (:261).
"""
import numpy as np
import pytest

from msmdfusion_tpu.core.evaluation import waymo_serialize as ws


def _waymo_proto_messages():
    """Build real protobuf message classes for Label/Object/Objects."""
    from google.protobuf import descriptor_pb2, descriptor_pool
    from google.protobuf import message_factory

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = 'waymo_test.proto'
    fdp.package = 'wtest'
    fdp.syntax = 'proto2'

    label = fdp.message_type.add()
    label.name = 'Label'
    box = label.nested_type.add()
    box.name = 'Box'
    for i, fname in enumerate(('center_x', 'center_y', 'center_z', 'length',
                               'width', 'height', 'heading'), start=1):
        f = box.field.add()
        f.name, f.number = fname, i
        f.type = descriptor_pb2.FieldDescriptorProto.TYPE_DOUBLE
        f.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL
    fb = label.field.add()
    fb.name, fb.number = 'box', 1
    fb.type = descriptor_pb2.FieldDescriptorProto.TYPE_MESSAGE
    fb.type_name = '.wtest.Label.Box'
    fb.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL
    ft = label.field.add()
    ft.name, ft.number = 'type', 3
    ft.type = descriptor_pb2.FieldDescriptorProto.TYPE_INT32
    ft.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL

    obj = fdp.message_type.add()
    obj.name = 'Object'
    fo = obj.field.add()
    fo.name, fo.number = 'object', 1
    fo.type = descriptor_pb2.FieldDescriptorProto.TYPE_MESSAGE
    fo.type_name = '.wtest.Label'
    fo.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL
    fs = obj.field.add()
    fs.name, fs.number = 'score', 2
    fs.type = descriptor_pb2.FieldDescriptorProto.TYPE_FLOAT
    fs.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL
    fc = obj.field.add()
    fc.name, fc.number = 'context_name', 4
    fc.type = descriptor_pb2.FieldDescriptorProto.TYPE_STRING
    fc.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL
    fm = obj.field.add()
    fm.name, fm.number = 'frame_timestamp_micros', 5
    fm.type = descriptor_pb2.FieldDescriptorProto.TYPE_INT64
    fm.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL

    objs = fdp.message_type.add()
    objs.name = 'Objects'
    fr = objs.field.add()
    fr.name, fr.number = 'objects', 1
    fr.type = descriptor_pb2.FieldDescriptorProto.TYPE_MESSAGE
    fr.type_name = '.wtest.Object'
    fr.label = descriptor_pb2.FieldDescriptorProto.LABEL_REPEATED

    pool = descriptor_pool.DescriptorPool()
    fd = pool.Add(fdp)
    return message_factory.GetMessageClass(
        fd.message_types_by_name['Objects'])


RESULTS = [
    dict(bboxes=np.array([[10.0, -4.0, -1.5, 4.6, 1.9, 1.7, 0.3],
                          [2.0, 8.0, -1.0, 0.8, 0.8, 1.8, 4.0]]),
         scores=np.array([0.9, 0.4]),
         labels=np.array([0, 1])),
    dict(bboxes=np.zeros((0, 7)), scores=np.zeros(0), labels=np.zeros(0)),
    dict(bboxes=np.array([[1.0, 1.0, 0.0, 1.8, 0.6, 1.6, -0.5]]),
         scores=np.array([0.7]), labels=np.array([2])),
]
CONTEXTS = [dict(context_name='seg-1', timestamp_micros=1001),
            dict(context_name='seg-2', timestamp_micros=1002),
            dict(context_name='seg-3', timestamp_micros=1003)]


def test_bin_parses_with_real_protobuf_runtime():
    buf = ws.serialize_waymo_objects(RESULTS, CONTEXTS)
    objects = _waymo_proto_messages()()
    objects.ParseFromString(buf)          # raises on malformed wire data
    assert len(objects.objects) == 3
    o0 = objects.objects[0]
    assert o0.context_name == 'seg-1'
    assert o0.frame_timestamp_micros == 1001
    assert o0.score == pytest.approx(0.9)
    assert o0.object.type == ws.TYPE_VEHICLE
    b = o0.object.box
    assert (b.center_x, b.center_y) == (10.0, -4.0)
    # bottom-center -> true center z (reference: y -= height/2 in the
    # KITTI camera frame, prediction_kitti_to_waymo.py:131)
    assert b.center_z == pytest.approx(-1.5 + 1.7 / 2)
    assert (b.length, b.width, b.height) == (4.6, 1.9, 1.7)
    assert b.heading == pytest.approx(0.3)
    # heading wraps into (-pi, pi] (reference :137-140)
    o1 = objects.objects[1]
    assert o1.object.box.heading == pytest.approx(4.0 - 2 * np.pi)
    assert o1.object.type == ws.TYPE_PEDESTRIAN
    assert objects.objects[2].object.type == ws.TYPE_CYCLIST
    assert objects.objects[2].context_name == 'seg-3'


def test_internal_decoder_roundtrip():
    buf = ws.serialize_waymo_objects(RESULTS, CONTEXTS)
    objs = ws.parse_objects_bin(buf)
    assert len(objs) == 3
    assert objs[0]['box'][:2] == [10.0, -4.0]
    assert objs[0]['type'] == ws.TYPE_VEHICLE
    # frame seg-2 has zero boxes: the flat object stream skips it
    assert objs[1]['context_name'] == 'seg-1'
    assert objs[2]['context_name'] == 'seg-3'


def test_waymo_dataset_format_results(tmp_path):
    import pickle
    from msmdfusion_tpu.datasets.other_datasets import WaymoDataset
    infos = [dict(point_cloud=dict(lidar_idx=f'0{i:06d}'),
                  context_name=f'ctx_{i}', timestamp=1000 + i,
                  annos=dict(name=np.array([]), location=np.zeros((0, 3)),
                             dimensions=np.zeros((0, 3)),
                             rotation_y=np.zeros(0),
                             bbox=np.zeros((0, 4)),
                             truncated=np.zeros(0), occluded=np.zeros(0),
                             alpha=np.zeros(0)))
             for i in range(2)]
    info_path = tmp_path / 'waymo_infos_val.pkl'
    with open(info_path, 'wb') as f:
        pickle.dump(infos, f)
    ds = WaymoDataset(data_root=str(tmp_path), ann_file=str(info_path),
                      pipeline=[], test_mode=True)
    out = ds.format_results(RESULTS[:2],
                            jsonfile_prefix=str(tmp_path / 'pred'))
    assert out.endswith('.bin')
    with open(out, 'rb') as f:
        objs = ws.parse_objects_bin(f.read())
    assert len(objs) == 2
    assert objs[0]['context_name'] == 'ctx_0'
    assert objs[0]['frame_timestamp_micros'] == 1000
