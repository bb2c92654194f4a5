"""TensorBoard event-file writer: round-trip decode of the TFRecord
framing (masked CRC32C) and the Event/Summary protos with an independent
mini-parser."""

import glob
import struct

import numpy as np

from fourdgs_tpu.utils import tb_writer as tb


def _read_records(path):
    out = []
    with open(path, "rb") as f:
        while True:
            head = f.read(8)
            if len(head) < 8:
                return out
            (ln,) = struct.unpack("<Q", head)
            (lcrc,) = struct.unpack("<I", f.read(4))
            assert lcrc == tb._masked_crc(head), "length CRC mismatch"
            data = f.read(ln)
            (dcrc,) = struct.unpack("<I", f.read(4))
            assert dcrc == tb._masked_crc(data), "data CRC mismatch"
            out.append(data)


def _parse_fields(buf):
    """proto buffer -> list of (field, wire, value)."""
    fields, i = [], 0
    while i < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = key >> 3, key & 7
        if wire == 0:
            v = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:
            v = struct.unpack("<d", buf[i:i + 8])[0]
            i += 8
        elif wire == 5:
            v = struct.unpack("<f", buf[i:i + 4])[0]
            i += 4
        elif wire == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = buf[i:i + ln]
            i += ln
        else:
            raise AssertionError(f"wire {wire}")
        fields.append((field, wire, v))
    return fields


def _get(fields, field):
    return [v for f, _, v in fields if f == field]


def test_event_file_roundtrip(tmp_path, rng):
    w = tb.TBWriter(str(tmp_path))
    w.add_scalar("train_loss_patches/total_loss", 0.125, 10)
    img = rng.random((8, 12, 3)).astype(np.float32)
    w.add_image("test_view_0/gt_vs_render", img, 20)
    w.add_histogram("scene/opacity_histogram", rng.random(100), 30)
    w.close()

    (path,) = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    records = _read_records(path)
    assert len(records) == 4                       # version + 3 events

    # Record 0: file_version.
    assert _get(_parse_fields(records[0]), 3) == [b"brain.Event:2"]

    # Scalar event.
    ev = _parse_fields(records[1])
    assert _get(ev, 2) == [10]                     # step
    val = _parse_fields(_get(_parse_fields(_get(ev, 5)[0]), 1)[0])
    assert _get(val, 1) == [b"train_loss_patches/total_loss"]
    assert _get(val, 2)[0] == 0.125

    # Image event: PNG bytes decode to the original (quantized) pixels.
    ev = _parse_fields(records[2])
    assert _get(ev, 2) == [20]
    val = _parse_fields(_get(_parse_fields(_get(ev, 5)[0]), 1)[0])
    image = _parse_fields(_get(val, 4)[0])
    assert _get(image, 1) == [8] and _get(image, 2) == [12]
    import io

    from PIL import Image as PILImage
    decoded = np.asarray(PILImage.open(io.BytesIO(_get(image, 4)[0])))
    np.testing.assert_array_equal(
        decoded, (np.clip(img, 0, 1) * 255).astype(np.uint8))

    # Histogram event: count/sum agree.
    ev = _parse_fields(records[3])
    val = _parse_fields(_get(_parse_fields(_get(ev, 5)[0]), 1)[0])
    histo = _parse_fields(_get(val, 7)[0])
    assert _get(histo, 3)[0] == 100.0              # num
    buckets = np.frombuffer(_get(histo, 8)[0], "<f8")
    assert buckets.sum() == 100.0
