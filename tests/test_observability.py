"""The first-party TensorBoard event writer (utils/tb_native.py) produces
files the REAL tensorboard reader parses back: TFRecord framing with masked
CRC32-C, hand-encoded Event/Summary protos, PNG image payloads."""
import numpy as np
import pytest

tb_loader = pytest.importorskip(
    "tensorboard.backend.event_processing.event_file_loader"
)


def _load_events(log_dir):
    """Read back through tensorboard's record reader (validates the TFRecord
    framing + CRCs) and the real protobuf Event parser — the raw loader, so
    tensorboard's data_compat migration doesn't rewrite simple_value into
    tensor form."""
    import pathlib

    from tensorboard.compat.proto import event_pb2

    files = list(pathlib.Path(log_dir).glob("events.out.tfevents.*"))
    assert len(files) == 1
    loader = tb_loader.RawEventFileLoader(str(files[0]))
    return [event_pb2.Event.FromString(raw) for raw in loader.Load()]


def test_native_tb_scalars_round_trip(tmp_path):
    from event_representation_study_tpu.utils.tb_native import NativeTBWriter

    w = NativeTBWriter(tmp_path)
    w.add_scalar("train/loss", 0.75, step=3)
    w.log({"train/iou": 0.5, "train/cls": 0.25, "skip": "notanumber"}, step=4)
    w.close()

    events = _load_events(tmp_path)
    assert events[0].file_version == "brain.Event:2"
    got = {}
    for e in events[1:]:
        for v in e.summary.value:
            got[(e.step, v.tag)] = v.simple_value
    assert got[(3, "train/loss")] == pytest.approx(0.75)
    assert got[(4, "train/iou")] == pytest.approx(0.5)
    assert got[(4, "train/cls")] == pytest.approx(0.25)
    assert all(tag != "skip" for _, tag in got)


def test_native_tb_image_round_trip(tmp_path):
    from event_representation_study_tpu.utils.tb_native import NativeTBWriter

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (8, 6, 3), dtype=np.uint8)
    w = NativeTBWriter(tmp_path)
    w.add_image("val/pred", img, step=1)
    w.close()

    events = _load_events(tmp_path)
    v = events[1].summary.value[0]
    assert v.tag == "val/pred"
    assert v.image.height == 8 and v.image.width == 6
    assert v.image.colorspace == 3
    png = v.image.encoded_image_string
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # decode the PNG back (zlib inflate + unfilter: filter byte is 0)
    import struct
    import zlib

    idat = b""
    off = 8
    while off < len(png):
        ln, tag = struct.unpack(">I4s", png[off:off + 8])
        if tag == b"IDAT":
            idat += png[off + 8:off + 8 + ln]
        off += 12 + ln
    raw = zlib.decompress(idat)
    rows = [raw[r * (1 + 6 * 3) + 1:(r + 1) * (1 + 6 * 3)] for r in range(8)]
    decoded = np.frombuffer(b"".join(rows), np.uint8).reshape(8, 6, 3)
    np.testing.assert_array_equal(decoded, img)


def test_negative_step_round_trips(tmp_path):
    """int64 proto varints: negative steps must encode as two's complement
    (not hang) and read back correctly."""
    from event_representation_study_tpu.utils.tb_native import NativeTBWriter

    w = NativeTBWriter(tmp_path)
    w.add_scalar("t", 1.0, step=-1)
    w.close()
    events = _load_events(tmp_path)
    assert events[1].step == -1


def test_two_writers_same_second_do_not_collide(tmp_path):
    from event_representation_study_tpu.utils.tb_native import NativeTBWriter

    a = NativeTBWriter(tmp_path)
    b = NativeTBWriter(tmp_path)
    a.add_scalar("x", 1.0, 0)
    b.add_scalar("x", 2.0, 0)
    a.close()
    b.close()
    import pathlib

    assert len(list(pathlib.Path(tmp_path).glob("events.out.tfevents.*"))) == 2


def test_crc32c_known_vectors():
    """CRC32-C test vectors (RFC 3720 appendix B.4)."""
    from event_representation_study_tpu.utils.tb_native import crc32c

    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(bytes(range(32))) == 0x46DD794E


def test_multiwriter_uses_native_tb(tmp_path):
    """MultiWriter's tensorboard backend activates without torch/tensorboard
    imports and its output parses."""
    from event_representation_study_tpu.utils.observability import MultiWriter

    mw = MultiWriter.default(tmp_path, use_tensorboard=True)
    assert len(mw.writers) == 2  # jsonl + native tb
    mw.log({"loss": 1.5}, step=0)
    mw.close()
    events = _load_events(tmp_path / "tb")
    assert events[1].summary.value[0].tag == "loss"
