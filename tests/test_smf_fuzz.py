"""Fuzz hardening of the SMF parsers.

Two properties, over a deterministic corpus of mutated and random MIDI bytes:

1. **Cross-parser parity on arbitrary input** — the native C++ parser and the
   Python parser either both reject a blob with ValueError or both produce
   identical scores. The Python parser's bounds discipline was aligned
   byte-for-byte with the native one (truncated events end the track
   gracefully; invalid status streams raise), so this is an equality check,
   not a best-effort one.
2. **Memory safety of the native parser** — the same corpus is run through a
   standalone driver compiled with AddressSanitizer + UBSan, exercising every
   C-ABI accessor. Any out-of-bounds read/write, leak, or UB aborts the run.

The reference stack delegated MIDI I/O to miditoolkit and carries no malformed
-input handling of its own; robust parsing is a new obligation of this
framework's self-contained SMF layer (smf.py / _native/smf.cpp).
"""
import os
import struct
import subprocess

import numpy as np
import pytest

from scoreperformer_tpu.data.synthetic import synthetic_score
from scoreperformer_tpu.midi.native import _SRC, native_available, read_midi_native
from scoreperformer_tpu.midi.smf import read_midi_py, write_midi

from test_native_smf import assert_scores_equal

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for the native parser"
)


def _seed_blobs():
    blobs = [
        write_midi(synthetic_score(np.random.RandomState(s), n_bars=8), None)
        for s in (1, 7)
    ]
    # a crafted blob touching every event kind (running status, aftertouch,
    # sysex, all meta types) so mutations explore those branches too
    from test_native_smf import _track_chunk

    header = b"MThd" + struct.pack(">IHHH", 6, 1, 2, 480)
    conductor = (
        b"\x00" + bytes([0xFF, 0x51, 0x03]) + (500000).to_bytes(3, "big")
        + b"\x00" + bytes([0xFF, 0x58, 0x04, 4, 2, 24, 8])
        + b"\x00" + bytes([0xFF, 0x59, 0x02]) + struct.pack("bB", -2, 1)
        + b"\x05" + bytes([0xFF, 0x06, 0x03]) + b"fuz"
    )
    piano = (
        b"\x00" + bytes([0xC0, 0x05])
        + b"\x00" + bytes([0x90, 60, 80])
        + b"\x00" + bytes([64, 70])  # running status
        + b"\x02" + bytes([0xA0, 64, 50])
        + b"\x00" + bytes([0xD0, 33])
        + b"\x00" + bytes([0xF0]) + b"\x02\x01\xf7"
        + b"\x05" + bytes([0xB0, 64, 127])
        + b"\x00" + bytes([0xE0, 0x10, 0x40])
        + b"\x05" + bytes([0x80, 60, 0])
        + b"\x05" + bytes([0x80, 64, 0])
    )
    blobs.append(header + _track_chunk(conductor) + _track_chunk(piano))
    return blobs


def _mutate(rng: np.random.RandomState, seed_blobs) -> bytes:
    base = bytearray(seed_blobs[rng.randint(len(seed_blobs))])
    op = rng.randint(6)
    if op == 0:  # flip 1-8 random bytes
        for _ in range(rng.randint(1, 9)):
            base[rng.randint(len(base))] = rng.randint(256)
    elif op == 1:  # truncate
        del base[rng.randint(1, len(base)) :]
    elif op == 2:  # insert random chunk
        at = rng.randint(len(base))
        base[at:at] = bytes(rng.randint(0, 256, rng.randint(1, 16), dtype=np.uint8))
    elif op == 3:  # delete a slice
        a = rng.randint(len(base) - 1)
        b = min(len(base), a + rng.randint(1, 16))
        del base[a:b]
    elif op == 4:  # valid header + garbage body
        base = bytearray(
            b"MThd" + struct.pack(">IHHH", 6, 1, rng.randint(1, 4), 480)
        )
        base += bytes(rng.randint(0, 256, rng.randint(4, 128), dtype=np.uint8))
    else:  # pure garbage
        base = bytearray(bytes(rng.randint(0, 256, rng.randint(0, 64), dtype=np.uint8)))
    return bytes(base)


def _corpus(n=400):
    rng = np.random.RandomState(0)
    seeds = _seed_blobs()
    blobs = list(seeds)
    blobs += [_mutate(rng, seeds) for _ in range(n)]
    return blobs


def test_fuzz_parity_native_vs_python():
    n_ok = n_err = 0
    for i, blob in enumerate(_corpus()):
        try:
            a = read_midi_py(blob)
            ok_py = True
        except ValueError:
            ok_py = False
        try:
            b = read_midi_native(blob)
            ok_nat = True
        except ValueError:
            ok_nat = False
        assert ok_py == ok_nat, f"case {i}: python ok={ok_py}, native ok={ok_nat}"
        if ok_py:
            assert_scores_equal(a, b)
            n_ok += 1
        else:
            n_err += 1
    # the corpus must exercise both outcomes to mean anything
    assert n_ok > 20 and n_err > 20, (n_ok, n_err)


def test_fuzz_asan_native(tmp_path):
    """Run the corpus through an ASan+UBSan build of the native parser."""
    driver = os.path.join(os.path.dirname(_SRC), "fuzz_main.cpp")
    exe = str(tmp_path / "smf_fuzz")
    try:
        subprocess.run(
            ["g++", "-O1", "-g", "-std=c++17", "-fsanitize=address,undefined",
             "-fno-sanitize-recover=all", _SRC, driver, "-o", exe],
            check=True, capture_output=True, timeout=180,
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        pytest.skip(f"sanitizer build unavailable: {e}")

    corpus_dir = tmp_path / "corpus"
    corpus_dir.mkdir()
    paths = []
    for i, blob in enumerate(_corpus()):
        p = corpus_dir / f"c{i:04d}.mid"
        p.write_bytes(blob)
        paths.append(str(p))
    res = subprocess.run(
        [exe] + paths, capture_output=True, timeout=300,
        env={**os.environ, "ASAN_OPTIONS": "detect_leaks=1"},
    )
    assert res.returncode == 0, (
        f"sanitizer failure:\n{res.stdout.decode()[-2000:]}\n{res.stderr.decode()[-4000:]}"
    )
