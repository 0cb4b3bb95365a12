"""Native (C++) SMF parser: parity with the Python reference parser."""
import os
import struct

import numpy as np
import pytest

from scoreperformer_tpu.data.synthetic import synthetic_score
from scoreperformer_tpu.midi import read_midi
from scoreperformer_tpu.midi.native import native_available, read_midi_native
from scoreperformer_tpu.midi.smf import _write_varlen, read_midi_py, write_midi

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for the native parser"
)


def assert_scores_equal(a, b):
    assert a.ticks_per_beat == b.ticks_per_beat
    assert len(a.tracks) == len(b.tracks)
    for ta, tb in zip(a.tracks, b.tracks):
        assert (ta.program, ta.is_drum, ta.name) == (tb.program, tb.is_drum, tb.name)
        for f in ("pitch", "velocity", "start", "end"):
            np.testing.assert_array_equal(getattr(ta.notes, f), getattr(tb.notes, f))
        np.testing.assert_array_equal(ta.control_changes, tb.control_changes)
        np.testing.assert_array_equal(ta.pitch_bends, tb.pitch_bends)
    np.testing.assert_array_equal(a.tempos.time, b.tempos.time)
    np.testing.assert_allclose(a.tempos.tempo, b.tempos.tempo)
    np.testing.assert_array_equal(a.time_sigs.time, b.time_sigs.time)
    np.testing.assert_array_equal(a.time_sigs.numerator, b.time_sigs.numerator)
    np.testing.assert_array_equal(a.time_sigs.denominator, b.time_sigs.denominator)
    assert a.key_sigs == b.key_sigs
    assert [(m.time, m.text) for m in a.markers] == [(m.time, m.text) for m in b.markers]
    assert a.max_tick == b.max_tick


@pytest.mark.parametrize("seed,n_bars", [(1, 6), (5, 40), (9, 120)])
def test_parity_on_synthetic_scores(seed, n_bars):
    score = synthetic_score(np.random.RandomState(seed), n_bars=n_bars)
    blob = write_midi(score, None)
    assert_scores_equal(read_midi_py(blob), read_midi_native(blob))


def _track_chunk(events: bytes) -> bytes:
    body = events + _write_varlen(0) + bytes([0xFF, 0x2F, 0x00])
    return b"MTrk" + struct.pack(">I", len(body)) + body


def test_parity_on_crafted_edge_cases():
    """Running status, velocity-0 note-offs, FIFO double-attack pairing,
    aftertouch/sysex skipping, key signature, dangling notes, drum channel."""
    header = b"MThd" + struct.pack(">IHHH", 6, 1, 3, 480)

    conductor = (
        _write_varlen(0) + bytes([0xFF, 0x51, 0x03]) + (500000).to_bytes(3, "big")
        + _write_varlen(0) + bytes([0xFF, 0x58, 0x04, 3, 3, 24, 8])  # 3/8
        + _write_varlen(0) + bytes([0xFF, 0x59, 0x02]) + struct.pack("bB", -3, 1)  # Ebm
        + _write_varlen(10) + bytes([0xFF, 0x06, 0x05]) + b"segno"
    )

    piano = (
        _write_varlen(0) + bytes([0xC0, 0x07])  # program 7 on ch 0
        + _write_varlen(0) + bytes([0x90, 60, 80])  # explicit status
        + _write_varlen(0) + bytes([64, 70])  # running status: note-on 64
        + _write_varlen(10) + bytes([60, 90])  # double attack on 60 (FIFO)
        + _write_varlen(10) + bytes([60, 0])  # vel-0 off -> closes FIRST 60
        + _write_varlen(0) + bytes([0xA0, 64, 50])  # poly aftertouch (skipped)
        + _write_varlen(0) + bytes([0xD0, 33])  # channel aftertouch (skipped)
        + _write_varlen(0) + bytes([0xF0]) + _write_varlen(3) + b"\x01\x02\xf7"  # sysex
        + _write_varlen(5) + bytes([0x80, 64, 64])  # note-off 64
        + _write_varlen(0) + bytes([0xB0, 64, 127])  # sustain CC
        + _write_varlen(0) + bytes([0xE0, 0x00, 0x50])  # pitch bend
        + _write_varlen(100) + bytes([0x90, 72, 99])  # dangling note (closed at EOT)
    )

    drums = (
        _write_varlen(0) + bytes([0x99, 36, 100])  # ch 9 note-on
        + _write_varlen(24) + bytes([0x89, 36, 0])
    )

    blob = header + _track_chunk(conductor) + _track_chunk(piano) + _track_chunk(drums)

    a = read_midi_py(blob)
    b = read_midi_native(blob)
    assert_scores_equal(a, b)

    # semantic spot checks on the parsed result itself
    assert a.key_sigs == [(0, "Ebm")]
    assert [m.text for m in a.markers] == ["segno"]
    drum_tracks = [t for t in a.tracks if t.is_drum]
    assert len(drum_tracks) == 1 and drum_tracks[0].notes.pitch.tolist() == [36]
    piano_tracks = [t for t in a.tracks if not t.is_drum]
    assert piano_tracks[0].program == 7
    # FIFO pairing: the first 60 (start 0) closed at tick 20, second dangles
    notes = piano_tracks[0].notes
    sel = (notes.start == 0) & (notes.pitch == 60)
    assert notes.end[sel].tolist() == [20]


def test_malformed_header_raises_in_both():
    with pytest.raises(ValueError):
        read_midi_py(b"not a midi file....")
    with pytest.raises(ValueError):
        read_midi_native(b"not a midi file....")


def test_dispatch_env_gate(tmp_path):
    score = synthetic_score(np.random.RandomState(2), n_bars=4)
    path = str(tmp_path / "s.mid")
    write_midi(score, path)
    via_default = read_midi(path)
    os.environ["SP_NATIVE_SMF"] = "0"
    try:
        via_python = read_midi(path)
    finally:
        os.environ.pop("SP_NATIVE_SMF")
    assert_scores_equal(via_default, via_python)
