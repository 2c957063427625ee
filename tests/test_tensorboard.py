"""TensorBoard event writer: golden-checked against the real `tensorboard`
package loader (proto + TFRecord framing must both be byte-correct), plus
round-trip through our own reader and the MetricWriter tee."""

import glob
import os

import numpy as np
import pytest

from text_to_image_tpu.utils import tensorboard as tb


def test_masked_crc_golden():
    # golden values for CRC32-C w/ TF masking (computable from the public
    # spec: crc32c("123456789") == 0xE3069283)
    assert tb._crc32c(b"123456789") == 0xE3069283
    assert tb._crc32c(b"") == 0
    masked = tb._masked_crc(b"123456789")
    crc = 0xE3069283
    assert masked == (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def test_varint_encoding():
    assert tb._varint(0) == b"\x00"
    assert tb._varint(1) == b"\x01"
    assert tb._varint(300) == b"\xac\x02"
    # negative int64 (two's complement, 10 bytes)
    assert len(tb._varint(-1)) == 10


def test_roundtrip_own_reader(tmp_path):
    w = tb.TBEventWriter(str(tmp_path), wall_time=1234.5)
    w.add_scalar("g_loss", 0.75, step=10, wall_time=1235.0)
    w.add_scalar("d_loss", -1.25, step=10)
    img = np.zeros((4, 6, 3), np.uint8)
    img[..., 0] = 255
    w.add_image("samples", img, step=10)
    w.close()

    events = tb.read_events(w.path)
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[0]["wall_time"] == 1234.5
    scalars = {k: v for e in events for k, v in e["scalars"].items()}
    assert scalars["g_loss"] == pytest.approx(0.75)
    assert scalars["d_loss"] == pytest.approx(-1.25)
    png = [e["images"] for e in events if e["images"]][0]["samples"]
    from PIL import Image
    import io
    arr = np.asarray(Image.open(io.BytesIO(png)))
    np.testing.assert_array_equal(arr, img)


def test_loadable_by_real_tensorboard(tmp_path):
    loader_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader")

    w = tb.TBEventWriter(str(tmp_path), wall_time=1000.0)
    w.add_scalar("loss", 3.5, step=7, wall_time=1001.0)
    img = np.full((2, 2, 3), 128, np.uint8)
    w.add_image("grid", img, step=7, wall_time=1002.0)
    w.close()

    from tensorboard.compat.proto import event_pb2

    # RawEventFileLoader yields the exact bytes (and still validates the
    # TFRecord framing); EventFileLoader would auto-migrate simple_value
    # to the tensor form, hiding the wire encoding we want to check.
    raw = list(loader_mod.RawEventFileLoader(w.path).Load())
    events = [event_pb2.Event.FromString(r) for r in raw]
    assert len(events) == 3
    assert events[0].file_version == "brain.Event:2"
    assert events[1].step == 7
    val = events[1].summary.value[0]
    assert val.tag == "loss"
    assert val.simple_value == pytest.approx(3.5)

    # and the high-level loader accepts the file (post-migration form)
    migrated = list(loader_mod.EventFileLoader(w.path).Load())
    assert migrated[1].summary.value[0].tensor.float_val[0] == pytest.approx(3.5)
    imgval = events[2].summary.value[0]
    assert imgval.tag == "grid"
    assert imgval.image.height == 2 and imgval.image.width == 2
    assert imgval.image.colorspace == 3
    assert imgval.image.encoded_image_string.startswith(b"\x89PNG")


def test_metric_writer_tees_to_tensorboard(tmp_path):
    from text_to_image_tpu.utils.metrics import MetricWriter

    mw = MetricWriter(str(tmp_path), also_print=False, tensorboard=True)
    mw.write(5, {"g_loss": 1.5, "d_loss": 0.25, "note": "str-skipped"})
    mw.write_image(5, "samples", np.zeros((4, 4, 3), np.uint8))
    mw.close()

    assert os.path.exists(os.path.join(str(tmp_path), "train.jsonl"))
    files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert len(files) == 1
    events = tb.read_events(files[0])
    scalars = {k: v for e in events for k, v in e["scalars"].items()}
    assert scalars["g_loss"] == pytest.approx(1.5)
    assert any(e["images"] for e in events)
