"""TensorBoard event writer: TFRecord framing + proto round trip.

Reference parity: mmcv TensorboardLoggerHook in log_config
(configs/MSMDFusion_nusc_voxel_LC.py:296-299). The writer hand-encodes
Event/Summary protos; these tests validate the wire format byte-exactly
(CRC32C test vectors) and via a full write->parse round trip.
"""
import struct

from msmdfusion_tpu.utils.tb_writer import (
    TensorboardEventWriter, _crc32c, _masked_crc, _varint, read_events)


def test_crc32c_vectors():
    # published CRC32C (Castagnoli) test vectors (RFC 3720 appendix B.4)
    assert _crc32c(b'') == 0x00000000
    assert _crc32c(b'123456789') == 0xE3069283
    assert _crc32c(b'\x00' * 32) == 0x8A9136AA
    assert _crc32c(bytes(range(32))) == 0x46DD794E


def test_masked_crc_matches_tf_formula():
    crc = _crc32c(b'123456789')
    expect = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert _masked_crc(b'123456789') == expect


def test_varint_encoding():
    assert _varint(0) == b'\x00'
    assert _varint(1) == b'\x01'
    assert _varint(300) == b'\xac\x02'
    # negative int64 encodes as 10-byte two's complement (proto3 int64)
    assert len(_varint(-1)) == 10


def test_event_file_round_trip(tmp_path):
    w = TensorboardEventWriter(str(tmp_path))
    w.write('train', 0, 50, {'loss': 1.5, 'loss_bbox': 0.25}, lr=1e-4)
    w.write('train', 0, 100, {'loss': 1.25})
    w.write('val', 0, 100, {'mAP': 0.42}, note='ignored-non-scalar')

    records = read_events(w.path)
    # first record is the file_version header
    assert records[0] == (0, {})
    steps = [r[0] for r in records[1:]]
    assert steps == [50, 100, 100]
    assert abs(records[1][1]['train/loss'] - 1.5) < 1e-6
    assert abs(records[1][1]['train/lr'] - 1e-4) < 1e-9
    assert abs(records[3][1]['val/mAP'] - 0.42) < 1e-6
    assert 'val/note' not in records[3][1]


def test_event_file_is_tfrecord_framed(tmp_path):
    w = TensorboardEventWriter(str(tmp_path))
    w.write('train', 0, 1, {'x': 1.0})
    blob = open(w.path, 'rb').read()
    (length,) = struct.unpack_from('<Q', blob, 0)
    (hcrc,) = struct.unpack_from('<I', blob, 8)
    assert hcrc == _masked_crc(blob[:8])
    (dcrc,) = struct.unpack_from('<I', blob, 12 + length)
    assert dcrc == _masked_crc(blob[12:12 + length])
    # first payload carries file_version "brain.Event:2"
    assert b'brain.Event:2' in blob[12:12 + length]
