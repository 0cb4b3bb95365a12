"""Self-contained TensorBoard event-file writer (training/tensorboard.py)."""
import struct

import numpy as np

from scoreperformer_tpu.training.tensorboard import (
    TensorBoardWriter,
    crc32c,
    read_events,
)


def test_crc32c_known_vectors():
    # RFC 3720 / iSCSI test vectors for CRC32C (Castagnoli)
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0x0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_writer_roundtrip(tmp_path):
    writer = TensorBoardWriter(str(tmp_path))
    writer.add_scalar("train/loss", 1.5, step=1)
    writer.add_scalar("train/loss", 0.75, step=2)
    writer.add_scalar("eval/accuracy", 0.9, step=2)
    writer.add_text("config/trainer", '{"epochs": 3}', step=0)
    writer.close()

    events = read_events(writer.path)  # read_events validates all CRCs
    assert events[0]["file_version"] == "brain.Event:2"

    scalars = [
        (e["step"], v["tag"], v["simple_value"])
        for e in events[1:]
        for v in e.get("summary", [])
        if "simple_value" in v
    ]
    assert (1, "train/loss", 1.5) in scalars
    assert (2, "train/loss", 0.75) in scalars
    assert any(t == "eval/accuracy" and abs(x - 0.9) < 1e-6 for _, t, x in scalars)

    texts = [
        v for e in events for v in e.get("summary", []) if "text" in v
    ]
    assert texts and texts[0]["tag"] == "config/trainer"
    assert "epochs" in texts[0]["text"]


def test_record_framing_matches_tfrecord_spec(tmp_path):
    """Byte-level check of the TFRecord framing of the first record."""
    writer = TensorBoardWriter(str(tmp_path))
    writer.close()
    raw = open(writer.path, "rb").read()
    (length,) = struct.unpack("<Q", raw[:8])
    payload = raw[12 : 12 + length]
    # the file_version event must contain the magic string
    assert b"brain.Event:2" in payload
    # trailing payload CRC closes the record exactly
    assert len(raw) == 8 + 4 + length + 4


def test_large_scalar_stream(tmp_path):
    writer = TensorBoardWriter(str(tmp_path))
    values = np.random.RandomState(0).randn(200)
    for i, v in enumerate(values):
        writer.add_scalar("metric", float(v), step=i)
    writer.close()
    events = read_events(writer.path)
    got = [
        v["simple_value"]
        for e in events[1:]
        for v in e.get("summary", [])
    ]
    np.testing.assert_allclose(got, values.astype(np.float32), rtol=1e-6)
