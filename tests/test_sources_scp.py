"""S7: SCP bulk staging (reference mira/mira_data.py:43-129).

No network in the sandbox, so the system ``scp`` is stubbed with a fake
executable on PATH that strips the ``host:`` prefix and copies locally —
the full subprocess → staging-dir → load path is exercised for real.
"""

from __future__ import annotations

import os
import stat

import pytest

from es_loaders_spark.sources import fetch_scp, read_tsv_scp

FAKE_SCP = """#!/bin/sh
# fake scp: real-scp option grammar — "--" ends option parsing, -P takes
# a value; records argv to $FAKE_SCP_LOG for assertions
if [ -n "$FAKE_SCP_LOG" ]; then printf '%s\\n' "$@" > "$FAKE_SCP_LOG"; fi
ops=""
while [ $# -gt 0 ]; do
  case "$1" in
    --) shift; break ;;
    -P) shift 2; continue ;;
    -*) shift; continue ;;
    *) ops="$ops $1"; shift ;;
  esac
done
while [ $# -gt 0 ]; do ops="$ops $1"; shift; done
set -- $ops
src="$1"; dst="$2"
path="${src#*:}"
if [ ! -f "$path" ]; then
  echo "scp: $path: No such file or directory" >&2
  exit 1
fi
cp "$path" "$dst"
"""


@pytest.fixture()
def fake_scp(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    scp = bindir / "scp"
    scp.write_text(FAKE_SCP)
    scp.chmod(scp.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    return str(scp)


def test_fetch_scp_stages_files(tmp_path, fake_scp):
    src1 = tmp_path / "cells.tsv"
    src1.write_text("cell_id\tsample\nc1\tS1\nc2\tS2\n")
    src2 = tmp_path / "genes.tsv"
    src2.write_text("gene\tidx\ng1\t0\n")
    dest = tmp_path / "staging"
    staged = fetch_scp(
        [f"juno:{src1}", f"scp://juno{src2}"], str(dest)
    )
    assert [os.path.basename(p) for p in staged] == ["cells.tsv", "genes.tsv"]
    assert open(staged[0]).read() == src1.read_text()
    assert open(staged[1]).read() == src2.read_text()


def test_fetch_scp_port_url(tmp_path, fake_scp, monkeypatch):
    """scp://host:port/path → scp -P port host:/path (ADVICE r04: was
    mangled to host:port:/path, losing the port and breaking the spec)."""
    src = tmp_path / "matrix.tsv"
    src.write_text("a\t1\n")
    log = tmp_path / "argv.log"
    monkeypatch.setenv("FAKE_SCP_LOG", str(log))
    staged = fetch_scp(f"scp://juno:2222{src}", str(tmp_path / "stage"))
    assert open(staged[0]).read() == src.read_text()
    argv = log.read_text().splitlines()
    p_at = argv.index("-P")
    assert argv[p_at + 1] == "2222"
    assert f"juno:{src}" in argv  # host:port: mangling gone
    with pytest.raises(ValueError, match="bad port"):
        fetch_scp(f"scp://juno:22x2{src}", str(tmp_path / "stage"))


def test_fetch_scp_dashed_spec_is_operand(tmp_path, fake_scp, monkeypatch):
    """A remote spec starting with '-' must ride after '--' so scp never
    parses it as an option (-oProxyCommand injection; ADVICE r04)."""
    src = tmp_path / "odd.tsv"
    src.write_text("x\n")
    log = tmp_path / "argv.log"
    monkeypatch.setenv("FAKE_SCP_LOG", str(log))
    staged = fetch_scp(f"-ohost:{src}", str(tmp_path / "stage"))
    assert open(staged[0]).read() == "x\n"
    argv = log.read_text().splitlines()
    assert argv.index("--") < argv.index(f"-ohost:{src}")


def test_fetch_scp_missing_remote_raises(tmp_path, fake_scp):
    with pytest.raises(RuntimeError, match="scp failed"):
        fetch_scp(f"juno:{tmp_path}/absent.tsv", str(tmp_path / "d"))


def test_fetch_scp_no_binary_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="not found on PATH"):
        fetch_scp("h:/x", str(tmp_path), scp_bin="definitely-not-a-binary")


def test_read_tsv_scp(spark, tmp_path, fake_scp):
    src = tmp_path / "samples.tsv"
    src.write_text("sample_id\tqc\nS1\t0.9\nS2\t0.8\n")
    df = read_tsv_scp(spark, f"juno:{src}", str(tmp_path / "stage"))
    assert df.columns == ["sample_id", "qc"]
    assert df.count() == 2
    assert abs(sum(r["qc"] for r in df.collect()) - 1.7) < 1e-9
