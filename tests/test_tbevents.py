"""TensorBoard event-file writer (utils/tbevents.py).

The reference logs scalars through ``tf.Summary`` + the TensorBoard
callback (train.py:72-79, 258-260).  Our writer hand-encodes the wire
format with no TF; these tests pin the format three independent ways:
known CRC32C vectors, a from-scratch TFRecord/proto parser written here,
and (when the ``tensorboard`` package is importable) TensorBoard's own
event loader.
"""

import glob
import os
import struct

import pytest

from radnet_tpu.utils.tbevents import (
    EventWriter,
    crc32c,
    frame_record,
    masked_crc32c,
    scalar_event,
)


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for Castagnoli CRC.
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0x0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


# ---------------------------------------------------------------------- #
# Independent decoders (deliberately NOT reusing the module's encoders).
# ---------------------------------------------------------------------- #


def _read_records(path):
    data = open(path, "rb").read()
    off, records = 0, []
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        (len_crc,) = struct.unpack_from("<I", data, off + 8)
        assert len_crc == masked_crc32c(data[off : off + 8])
        payload = data[off + 12 : off + 12 + length]
        (crc,) = struct.unpack_from("<I", data, off + 12 + length)
        assert crc == masked_crc32c(payload)
        records.append(payload)
        off += 12 + length + 4
    assert off == len(data)
    return records


def _decode_fields(buf):
    """Proto wire decode -> list of (field_number, wire_type, value)."""
    out, off = [], 0
    while off < len(buf):
        key, off = _uvarint(buf, off)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, off = _uvarint(buf, off)
        elif wire == 1:
            (val,) = struct.unpack_from("<d", buf, off)
            off += 8
        elif wire == 5:
            (val,) = struct.unpack_from("<f", buf, off)
            off += 4
        elif wire == 2:
            n, off = _uvarint(buf, off)
            val = buf[off : off + n]
            off += n
        else:  # pragma: no cover
            raise AssertionError(f"unexpected wire type {wire}")
        out.append((field, wire, val))
    return out


def _uvarint(buf, off):
    shift = val = 0
    while True:
        b = buf[off]
        off += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, off
        shift += 7


def _decode_event(payload):
    ev = {"values": {}}
    for field, _, val in _decode_fields(payload):
        if field == 1:
            ev["wall_time"] = val
        elif field == 2:
            ev["step"] = val
        elif field == 3:
            ev["file_version"] = val.decode()
        elif field == 5:
            for f2, _, v2 in _decode_fields(val):
                assert f2 == 1  # repeated Summary.Value
                tag = simple = None
                for f3, _, v3 in _decode_fields(v2):
                    if f3 == 1:
                        tag = v3.decode()
                    elif f3 == 2:
                        simple = v3
                ev["values"][tag] = simple
    return ev


def test_event_writer_roundtrip(tmp_path):
    w = EventWriter(str(tmp_path))
    w.add_scalars(0, {"rpn_cls_loss": 1.5, "rpn_reg_loss": 0.25}, wall_time=123.0)
    w.add_scalars(7, {"total_loss": 3.75})
    w.close()

    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1

    records = _read_records(files[0])
    assert len(records) == 3
    head = _decode_event(records[0])
    assert head["file_version"] == "brain.Event:2"

    e0 = _decode_event(records[1])
    assert e0["step"] == 0 and e0["wall_time"] == 123.0
    assert e0["values"] == {"rpn_cls_loss": 1.5, "rpn_reg_loss": 0.25}

    e1 = _decode_event(records[2])
    assert e1["step"] == 7
    assert e1["values"] == {"total_loss": 3.75}
    assert e1["wall_time"] > 0


def test_frame_record_structure():
    payload = scalar_event(3, {"x": 2.0}, wall_time=1.0)
    rec = frame_record(payload)
    (length,) = struct.unpack_from("<Q", rec, 0)
    assert length == len(payload)
    assert rec[12 : 12 + length] == payload


def test_tensorboard_itself_reads_our_files(tmp_path):
    """The real compatibility check: TensorBoard's own event loader."""
    pytest.importorskip("tensorboard")
    from tensorboard.backend.event_processing.event_file_loader import (
        RawEventFileLoader,
    )
    from tensorboard.compat.proto.event_pb2 import Event

    w = EventWriter(str(tmp_path))
    w.add_scalars(11, {"detector_acc": 0.5, "detector_cls_loss": 2.0})
    w.close()

    [path] = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    events = [Event.FromString(raw) for raw in RawEventFileLoader(path).Load()]
    assert events[0].file_version == "brain.Event:2"
    assert events[1].step == 11
    got = {v.tag: v.simple_value for v in events[1].summary.value}
    assert got == {"detector_acc": 0.5, "detector_cls_loss": 2.0}
