"""Command-line codec surface (hsc_tpu/cli.py, installed as `hsc-codec`)."""

import json
import subprocess
import sys

import numpy as np
import pytest


def _run(args, check=True):
    proc = subprocess.run(
        [sys.executable, "-m", "hsc_tpu.cli", *args],
        capture_output=True,
        text=True,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin", "HOME": "/tmp"},
        cwd=None,
        timeout=300,
    )
    if check and proc.returncode != 0:
        raise AssertionError(proc.stderr[-2000:])
    return proc


@pytest.fixture(scope="module")
def cli_fixture(tmp_path_factory, mld1):
    d = tmp_path_factory.mktemp("cli")
    mld1.save(str(d / "dict.npz"))
    from hsc_tpu import SignalGenerator

    x = SignalGenerator(mld1, rates=4e-3).generate_signals(
        3, mld1.config.block_size, seed=55
    )
    np.save(d / "sig.npy", x.reshape(-1))
    return d


def test_cli_roundtrip(cli_fixture):
    d = cli_fixture
    out = _run([
        "encode", "--dict", str(d / "dict.npz"), "--input", str(d / "sig.npy"),
        "--output", str(d / "s.hsct"), "--backend", "jax", "--platform", "cpu",
    ])
    assert "bytes" in out.stdout
    out = _run([
        "decode", "--dict", str(d / "dict.npz"), "--input", str(d / "s.hsct"),
        "--output", str(d / "r.npy"), "--backend", "jax", "--platform", "cpu",
    ])
    r = np.load(d / "r.npy")
    x = np.load(d / "sig.npy").reshape(r.shape)
    num = (x * x).sum(1)
    den = ((x - r) ** 2).sum(1)
    assert (10 * np.log10(num / den)).mean() > 3.0


def test_cli_info(cli_fixture):
    d = cli_fixture
    out = _run(["info", "--input", str(d / "s.hsct")])
    doc = json.loads(out.stdout)
    assert doc["blocks"] == 3
    # the default decode_mode resolves to 'integer' (the recommended fast
    # decoder; config.py 'auto') and the stream header carries the resolved
    # concrete mode
    assert doc["config"]["decode_mode"] == "integer"
    assert doc["compression_ratio"] > 1


def test_cli_overrides_and_errors(cli_fixture):
    d = cli_fixture
    _run([
        "encode", "--dict", str(d / "dict.npz"), "--input", str(d / "sig.npy"),
        "--output", str(d / "s2.hsct"), "--backend", "jax", "--platform", "cpu",
        "--entropy", "rice", "--decode-mode", "integer", "--num-select", "2",
        "--num-coefs", "32",
    ])
    doc = json.loads(_run(["info", "--input", str(d / "s2.hsct")]).stdout)
    assert doc["config"]["entropy"] == "rice"
    assert doc["config"]["decode_mode"] == "integer"
    assert doc["config"]["num_coefs"][-1] == 32
    # bad magic
    bad = _run(["info", "--input", str(d / "sig.npy")], check=False)
    assert bad.returncode != 0 and "bad magic" in (bad.stderr + bad.stdout)
    # encode without --dict
    nodict = _run(
        ["encode", "--input", str(d / "sig.npy"), "--output", str(d / "x")],
        check=False,
    )
    assert nodict.returncode != 0


def test_cli_streaming_decode_identical(cli_fixture):
    """--streaming writes the same bytes as the in-memory decode.
    Self-contained: encodes its own container (test order independent)."""
    d = cli_fixture
    _run([
        "encode", "--dict", str(d / "dict.npz"), "--input", str(d / "sig.npy"),
        "--output", str(d / "ss.hsct"), "--backend", "jax", "--platform", "cpu",
    ])
    _run([
        "decode", "--dict", str(d / "dict.npz"), "--input", str(d / "ss.hsct"),
        "--output", str(d / "rplain.npy"), "--backend", "jax",
        "--platform", "cpu",
    ])
    _run([
        "decode", "--dict", str(d / "dict.npz"), "--input", str(d / "ss.hsct"),
        "--output", str(d / "rs.npy"), "--backend", "jax", "--platform", "cpu",
        "--streaming",
    ])
    a = np.load(d / "rs.npy")
    b = np.load(d / "rplain.npy")
    assert a.tobytes() == b.tobytes()


def test_cli_mmap_encode_identical(cli_fixture):
    """--mmap (memory-mapped bounded-memory encode) emits byte-identical
    containers; non-float32 or ragged inputs fail with a clean message."""
    d = cli_fixture
    _run([
        "encode", "--dict", str(d / "dict.npz"), "--input", str(d / "sig.npy"),
        "--output", str(d / "m0.hsct"), "--backend", "jax", "--platform", "cpu",
    ])
    _run([
        "encode", "--dict", str(d / "dict.npz"), "--input", str(d / "sig.npy"),
        "--output", str(d / "m1.hsct"), "--backend", "jax", "--platform", "cpu",
        "--mmap",
    ])
    assert (d / "m0.hsct").read_bytes() == (d / "m1.hsct").read_bytes()

    np.save(d / "f64.npy", np.load(d / "sig.npy").astype(np.float64))
    p = _run([
        "encode", "--dict", str(d / "dict.npz"), "--input", str(d / "f64.npy"),
        "--output", str(d / "m2.hsct"), "--backend", "jax", "--platform", "cpu",
        "--mmap",
    ], check=False)
    assert p.returncode != 0 and "float32" in p.stderr

    np.save(d / "ragged.npy", np.load(d / "sig.npy")[:-7])
    p = _run([
        "encode", "--dict", str(d / "dict.npz"), "--input", str(d / "ragged.npy"),
        "--output", str(d / "m3.hsct"), "--backend", "jax", "--platform", "cpu",
        "--mmap",
    ], check=False)
    assert p.returncode != 0 and "whole blocks" in p.stderr


def test_cli_learn_then_roundtrip(cli_fixture):
    """`learn` produces a dictionary the encode/decode verbs accept end to
    end (the reference's training-driver surface as a CLI verb)."""
    d = cli_fixture
    _run([
        "learn", "--input", str(d / "sig.npy"),
        "--output", str(d / "learned.npz"), "--platform", "cpu",
        "--counts", "8", "--scales", "16", "--block-size", "1024",
        "--learn-coefs", "48", "--num-windows", "256", "--iterations", "4",
        "--num-coefs", "40",  # top-level budget override (encode semantics)
    ])
    from hsc_tpu import MultilevelDictionary

    assert MultilevelDictionary.load(
        str(d / "learned.npz")
    ).config.num_coefs == (40,)
    _run([
        "encode", "--dict", str(d / "learned.npz"),
        "--input", str(d / "sig.npy"), "--output", str(d / "sl.hsct"),
        "--backend", "jax", "--platform", "cpu",
    ])
    _run([
        "decode", "--dict", str(d / "learned.npz"),
        "--input", str(d / "sl.hsct"), "--output", str(d / "rl.npy"),
        "--backend", "jax", "--platform", "cpu",
    ])
    r = np.load(d / "rl.npy")
    x = np.load(d / "sig.npy").reshape(r.shape)
    num = (x * x).sum(1)
    den = ((x - r) ** 2).sum(1)
    assert (10 * np.log10(num / den)).mean() > 2.0  # learned dict explains
    # 2-level learn: the multilevel alternation end to end
    _run([
        "learn", "--input", str(d / "sig.npy"),
        "--output", str(d / "learned2.npz"), "--platform", "cpu",
        "--counts", "6,4", "--scales", "16,32", "--block-size", "1024",
        "--learn-coefs", "48,24", "--num-windows", "128", "--iterations", "3",
    ])
    _run([
        "encode", "--dict", str(d / "learned2.npz"),
        "--input", str(d / "sig.npy"), "--output", str(d / "sl2.hsct"),
        "--backend", "jax", "--platform", "cpu",
    ])
    _run([
        "decode", "--dict", str(d / "learned2.npz"),
        "--input", str(d / "sl2.hsct"), "--output", str(d / "rl2.npy"),
        "--backend", "jax", "--platform", "cpu",
    ])
    assert np.load(d / "rl2.npy").shape == x.shape
    # geometry errors are clean SystemExits, not tracebacks
    noargs = _run(
        ["learn", "--input", str(d / "sig.npy"), "--output", str(d / "y.npz")],
        check=False,
    )
    assert noargs.returncode != 0
    assert "--counts" in (noargs.stderr + noargs.stdout)


def test_cli_indexed_encode_and_range_decode(cli_fixture):
    """encode --index appends the seek footer (reported by info); decode
    --range serves the selected rows byte-identical to the full decode."""
    d = cli_fixture
    _run([
        "encode", "--dict", str(d / "dict.npz"), "--input", str(d / "sig.npy"),
        "--output", str(d / "si.hsct"), "--backend", "jax", "--platform",
        "cpu", "--index",
    ])
    out = _run(["info", "--input", str(d / "si.hsct")])
    assert json.loads(out.stdout)["seek_index"] is True
    _run([
        "decode", "--dict", str(d / "dict.npz"), "--input", str(d / "si.hsct"),
        "--output", str(d / "rall.npy"), "--backend", "jax", "--platform",
        "cpu",
    ])
    _run([
        "decode", "--dict", str(d / "dict.npz"), "--input", str(d / "si.hsct"),
        "--output", str(d / "r12.npy"), "--backend", "jax", "--platform",
        "cpu", "--range", "1:3",
    ])
    rall = np.load(d / "rall.npy")
    r12 = np.load(d / "r12.npy")
    assert r12.shape[0] == 2
    assert r12.tobytes() == rall[1:3].tobytes()
    # python slice semantics: out-of-range bounds clamp, negatives count
    # from the end — never a traceback
    _run([
        "decode", "--dict", str(d / "dict.npz"), "--input", str(d / "si.hsct"),
        "--output", str(d / "rclamp.npy"), "--backend", "jax", "--platform",
        "cpu", "--range=-2:999",  # '=' form: argparse reads '-2…' as a flag
    ])
    rclamp = np.load(d / "rclamp.npy")
    assert rclamp.tobytes() == rall[-2:].tobytes()
    # malformed range is a clean SystemExit, not a stack trace
    bad = _run([
        "decode", "--dict", str(d / "dict.npz"), "--input", str(d / "si.hsct"),
        "--output", str(d / "x.npy"), "--platform", "cpu", "--range", "oops",
    ], check=False)
    assert bad.returncode != 0 and "A:B" in bad.stderr


def test_cli_streaming_range_decode(cli_fixture):
    """--streaming composes with --range: memmapped output of just the
    selected rows, byte-identical to the full decode's slice."""
    d = cli_fixture
    _run([
        "encode", "--dict", str(d / "dict.npz"), "--input", str(d / "sig.npy"),
        "--output", str(d / "si.hsct"), "--backend", "jax", "--platform",
        "cpu", "--index",
    ])
    _run([
        "decode", "--dict", str(d / "dict.npz"), "--input", str(d / "si.hsct"),
        "--output", str(d / "rall.npy"), "--backend", "jax", "--platform",
        "cpu",
    ])
    _run([
        "decode", "--dict", str(d / "dict.npz"), "--input", str(d / "si.hsct"),
        "--output", str(d / "rs02.npy"), "--backend", "jax", "--platform",
        "cpu", "--range", "0:2", "--streaming",
    ])
    rall = np.load(d / "rall.npy")
    rs = np.load(d / "rs02.npy")
    assert rs.shape[0] == 2
    assert rs.tobytes() == rall[0:2].tobytes()


def test_cli_mmap_decode_identical(cli_fixture):
    """decode --mmap memory-maps the container; combined with --streaming
    --range, only the touched payloads are read — bytes identical."""
    d = cli_fixture
    _run([
        "decode", "--dict", str(d / "dict.npz"), "--input", str(d / "si.hsct"),
        "--output", str(d / "rmm.npy"), "--backend", "jax", "--platform",
        "cpu", "--mmap", "--streaming", "--range", "0:2",
    ])
    rall = np.load(d / "rall.npy")
    rmm = np.load(d / "rmm.npy")
    assert rmm.tobytes() == rall[0:2].tobytes()


def test_cli_info_mmap(cli_fixture):
    """info --mmap walks the container lazily off a memory map — same
    output as the in-memory form."""
    d = cli_fixture
    a = json.loads(_run(["info", "--input", str(d / "s.hsct")]).stdout)
    b = json.loads(_run(
        ["info", "--input", str(d / "s.hsct"), "--mmap"]
    ).stdout)
    assert a == b


def test_cli_mesh_encode_decode_identical(cli_fixture):
    """--mesh N shards the CLI encode/decode over a virtual device mesh —
    container and decoded bytes identical to the local path."""
    d = cli_fixture
    env = {
        "JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin", "HOME": "/tmp",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    }

    def run8(args):
        proc = subprocess.run(
            [sys.executable, "-m", "hsc_tpu.cli", *args],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        return proc

    run8([
        "encode", "--dict", str(d / "dict.npz"), "--input", str(d / "sig.npy"),
        "--output", str(d / "s0m.hsct"), "--backend", "jax", "--platform",
        "cpu",
    ])
    run8([
        "encode", "--dict", str(d / "dict.npz"), "--input", str(d / "sig.npy"),
        "--output", str(d / "sm.hsct"), "--backend", "jax", "--platform",
        "cpu", "--mesh", "8",
    ])
    assert (d / "sm.hsct").read_bytes() == (d / "s0m.hsct").read_bytes()
    run8([
        "decode", "--dict", str(d / "dict.npz"), "--input", str(d / "sm.hsct"),
        "--output", str(d / "r0m.npy"), "--backend", "jax", "--platform",
        "cpu",
    ])
    run8([
        "decode", "--dict", str(d / "dict.npz"), "--input", str(d / "sm.hsct"),
        "--output", str(d / "rm.npy"), "--backend", "jax", "--platform",
        "cpu", "--mesh", "8",
    ])
    assert np.load(d / "rm.npy").tobytes() == np.load(d / "r0m.npy").tobytes()
    # too many devices -> clean error
    bad = _run([
        "encode", "--dict", str(d / "dict.npz"), "--input", str(d / "sig.npy"),
        "--output", str(d / "x.hsct"), "--platform", "cpu", "--mesh", "9",
    ], check=False)
    assert bad.returncode != 0 and "visible" in bad.stderr


def test_cli_assemble_from_journal(cli_fixture, tmp_path):
    """`assemble` emits a container byte-identical to the encode that wrote
    the journal, recovering config/process-count/block-count from the
    journal directory alone (no --dict, no out-of-band config — SURVEY.md
    §2.3 P9 process-0 assembly as an operator command)."""
    d = cli_fixture
    jdir = tmp_path / "j"
    _run([
        "encode", "--input", str(d / "sig.npy"), "--dict", str(d / "dict.npz"),
        "--output", str(tmp_path / "enc.hsct"), "--backend", "jax",
        "--platform", "cpu", "--journal-dir", str(jdir),
    ])
    _run([
        "assemble", "--input", str(jdir),
        "--output", str(tmp_path / "asm.hsct"),
    ])
    assert (tmp_path / "asm.hsct").read_bytes() == (
        tmp_path / "enc.hsct"
    ).read_bytes()

    # two-process journals: split the blocks between p0 and a p1 journal the
    # way a second host would have written them, re-assemble, byte-identical
    from hsc_tpu.io.journal import EncodeJournal
    from hsc_tpu.runtime import _journal_name

    j0 = EncodeJournal(str(jdir), name=_journal_name(0))
    moved = sorted(j0.done_blocks)[1::2]
    j1 = EncodeJournal(str(jdir / "split"), name=_journal_name(1))
    j0_keep = EncodeJournal(str(jdir / "split"), name=_journal_name(0))
    import shutil

    shutil.copy(jdir / "corpus.config", jdir / "split" / "corpus.config")
    for bid in sorted(j0.done_blocks):
        (j1 if bid in moved else j0_keep).record(bid, j0.read(bid))
    for j in (j0, j1, j0_keep):
        j.close()
    _run([
        "assemble", "--input", str(jdir / "split"),
        "--output", str(tmp_path / "asm2.hsct"),
    ])
    assert (tmp_path / "asm2.hsct").read_bytes() == (
        tmp_path / "enc.hsct"
    ).read_bytes()

    # not a journal dir -> clean usage error
    p = _run(
        ["assemble", "--input", str(tmp_path), "--output",
         str(tmp_path / "x.hsct")],
        check=False,
    )
    assert p.returncode != 0 and "journal" in p.stderr

    # a block gap (a host died mid-corpus) -> clean error naming the ids
    jgap = EncodeJournal(str(jdir / "gap"), name=_journal_name(0))
    src = EncodeJournal(str(jdir), name=_journal_name(0))
    ids = sorted(src.done_blocks)
    for bid in ids:
        if bid != ids[1]:
            jgap.record(bid, src.read(bid))
    jgap.close(); src.close()
    shutil.copy(jdir / "corpus.config", jdir / "gap" / "corpus.config")
    p = _run(
        ["assemble", "--input", str(jdir / "gap"), "--output",
         str(tmp_path / "g.hsct")],
        check=False,
    )
    assert p.returncode != 0
    assert "not yet encoded" in p.stderr and str(ids[1]) in p.stderr
    assert "Traceback" not in p.stderr


def test_cli_assemble_cbr_journal(cli_fixture, tmp_path):
    """`assemble` understands journals written under --target-bps (the
    :cbr= fingerprint suffix — regression: the first CBR cut broke both
    assembly paths with a JSONDecodeError) and reproduces the CBR encode's
    container byte-for-byte, including combined with --distributed (the
    suffixes stack: :distributed then :cbr=; the parser strips in reverse),
    and including when process 0's files are absent (config falls back to
    any corpus.pN.config)."""
    import shutil

    d = cli_fixture
    jdir = tmp_path / "jc"
    _run([
        "encode", "--input", str(d / "sig.npy"), "--dict", str(d / "dict.npz"),
        "--output", str(tmp_path / "cbr.hsct"), "--backend", "jax",
        "--platform", "cpu", "--journal-dir", str(jdir),
        "--target-bps", "0.5",
    ])
    _run([
        "assemble", "--input", str(jdir),
        "--output", str(tmp_path / "cbr_asm.hsct"),
    ])
    assert (tmp_path / "cbr_asm.hsct").read_bytes() == (
        tmp_path / "cbr.hsct"
    ).read_bytes()

    # distributed + CBR: both fingerprint suffixes through the CLI path.
    # mld1 is single-level, so --distributed is a passthrough for streams
    # but DOES land in the fingerprint — exactly the parsing under test.
    jdir2 = tmp_path / "jcd"
    _run([
        "encode", "--input", str(d / "sig.npy"), "--dict", str(d / "dict.npz"),
        "--output", str(tmp_path / "cbrd.hsct"), "--backend", "jax",
        "--platform", "cpu", "--journal-dir", str(jdir2),
        "--target-bps", "0.5", "--distributed",
    ])
    _run([
        "assemble", "--input", str(jdir2),
        "--output", str(tmp_path / "cbrd_asm.hsct"),
    ])
    assert (tmp_path / "cbrd_asm.hsct").read_bytes() == (
        tmp_path / "cbrd.hsct"
    ).read_bytes()

    # p0 files absent (host 0 never wrote anything — every block journaled
    # by p1): the config falls back to the surviving corpus.p1.config and
    # assembly still reproduces the container byte-for-byte
    jdir3 = tmp_path / "jp0"
    jdir3.mkdir()
    for f in jdir2.iterdir():
        shutil.copy(f, jdir3 / f.name.replace("corpus.", "corpus.p1.", 1))
    _run([
        "assemble", "--input", str(jdir3),
        "--output", str(tmp_path / "p0.hsct"),
    ])
    assert (tmp_path / "p0.hsct").read_bytes() == (
        tmp_path / "cbrd.hsct"
    ).read_bytes()
    # p0's journal/blocks/config must NOT have been fabricated by probing
    assert not (jdir3 / "corpus.journal").exists()
    assert not (jdir3 / "corpus.config").exists()
