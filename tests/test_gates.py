"""Quality-gate mechanism (configs/gates.py + the decide_* stage scripts).

The gate file decides which serving path is the sdf-nerfacto DEFAULT —
i.e. what bench.py reports as the headline — so its read/write plumbing
gets regression tests: a drifted or malformed gates.json must raise
loudly (VERDICT r4 weak #7: the round-4 string-patching flip could
silently no-op), and a FAILED gate must write value=false, reverting any
earlier flip (advisor r4 medium).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

from nerf_emitter_tpu.configs import gates as gates_mod  # noqa: E402
from nerf_emitter_tpu.configs.gates import (  # noqa: E402
    gate_default,
    load_gates,
    write_gate,
)


@pytest.fixture()
def tmp_gates(tmp_path, monkeypatch):
    """Point the gates module at a scratch copy of the committed file."""
    path = tmp_path / "gates.json"
    path.write_text((REPO / "nerf_emitter_tpu/configs/gates.json").read_text())
    monkeypatch.setattr(gates_mod, "_GATES_PATH", path)
    return path


def test_committed_gates_file_parses():
    gates = load_gates()
    assert {"distill_emitter", "emitter_samples_reduced"} <= set(gates)
    for entry in gates.values():
        assert isinstance(entry["value"], bool)


def test_unknown_gate_raises():
    with pytest.raises(KeyError):
        gate_default("no_such_gate")
    with pytest.raises(KeyError):
        write_gate("no_such_gate", True, "t", "t", "t")


def test_malformed_gates_raise(tmp_gates):
    tmp_gates.write_text('{"distill_emitter": true}')
    with pytest.raises(ValueError):
        load_gates()


def test_write_gate_roundtrip_and_revert(tmp_gates):
    write_gate("distill_emitter", True, decided_by="test",
               evidence="pass", decided_at="2026-08-20T00:00:00Z")
    assert gate_default("distill_emitter") is True
    # a later FAILED gate must revert the flip, not leave it standing
    write_gate("distill_emitter", False, decided_by="test",
               evidence="fail", decided_at="2026-08-20T01:00:00Z")
    assert gate_default("distill_emitter") is False
    entry = load_gates()["distill_emitter"]
    assert entry["evidence"] == "fail"


def test_method_config_reads_gate(tmp_gates):
    """sdf-nerfacto's distill_emitter default tracks gates.json."""
    from nerf_emitter_tpu.configs.methods import METHOD_CONFIGS

    raw = json.loads(tmp_gates.read_text())
    for value in (True, False):
        raw["distill_emitter"]["value"] = value
        tmp_gates.write_text(json.dumps(raw))
        cfg = METHOD_CONFIGS["sdf-nerfacto"]()
        assert cfg.pipeline.distill_emitter is value


def _metrics(tmp_path, name, psnr, chamfer):
    e = tmp_path / f"{name}_eval.json"
    e.write_text(json.dumps({"results": {"psnr": psnr, "ssim": 0.5}}))
    c = tmp_path / f"{name}_chamfer.json"
    c.write_text(json.dumps({"chamfer": chamfer}))
    return str(e), str(c)


@pytest.mark.parametrize(
    "dl_psnr,dl_chamfer,expect",
    [
        (20.05, 0.0150, True),   # within 0.1 dB and <1.15x chamfer
        (19.50, 0.0150, False),  # PSNR regression
        (20.05, 0.0200, False),  # chamfer regression
    ],
)
def test_decide_distill_gate(tmp_gates, tmp_path, dl_psnr, dl_chamfer, expect):
    sys.path.insert(0, str(REPO / "scripts/round5"))
    try:
        import decide_distill
    finally:
        sys.path.pop(0)
    pf_e, pf_c = _metrics(tmp_path, "pf", 20.10, 0.0145)
    dl_e, dl_c = _metrics(tmp_path, "dl", dl_psnr, dl_chamfer)
    rc = decide_distill.main([pf_e, dl_e, pf_c, dl_c, "--scale", "prod"])
    assert rc == 0
    assert gate_default("distill_emitter") is expect


def test_decide_distill_report_only_never_writes(tmp_gates, tmp_path):
    sys.path.insert(0, str(REPO / "scripts/round5"))
    try:
        import decide_distill
    finally:
        sys.path.pop(0)
    before = tmp_gates.read_text()
    pf_e, pf_c = _metrics(tmp_path, "pf", 20.0, 0.015)
    dl_e, dl_c = _metrics(tmp_path, "dl", 25.0, 0.010)
    decide_distill.main([pf_e, dl_e, pf_c, dl_c, "--report-only"])
    assert tmp_gates.read_text() == before
