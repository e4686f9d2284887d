"""`cli parity` gate semantics (stubbed protocol run — no model compile)."""

import json
import types

import numpy as np
import pytest


def _run(monkeypatch, capsys, auc, expect="0.5,0.7,0.8,0.85", gate=1.0):
    from geoformer_tpu import cli

    monkeypatch.setattr(cli, "_model_and_params",
                        lambda args: (None, None))
    import geoformer_tpu.eval.hpatches as hp

    monkeypatch.setattr(hp, "eval_hpatches",
                        lambda *a, **k: {"auc_a": auc, "est_failed": 0,
                                         "n_pairs": 540,
                                         "mean_matches": 900.0})
    args = types.SimpleNamespace(
        hpatches="/nonexistent", imsize=480, ransac_thr=3.0, max_seqs=None,
        expect=expect, gate_pt=gate, ckpt="x.npz", match_thr=0.2,
        max_matches=1024, gam_ransac_iters=256, gam_max_inliers=1024,
        bf16=False, pallas=False, int8=False, int8_full=False)
    code = 0
    try:
        cli.cmd_parity(args)
    except SystemExit as e:
        code = e.code
    return code, json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_parity_gate_passes_within_tolerance(monkeypatch, capsys):
    code, rec = _run(monkeypatch, capsys, [0.495, 0.71, 0.80, 0.86])
    assert code == 0 and rec["pass"]
    np.testing.assert_allclose(rec["delta_pt"], [-0.5, 1.0, 0.0, 1.0])


def test_parity_gate_fails_beyond_tolerance(monkeypatch, capsys):
    code, rec = _run(monkeypatch, capsys, [0.48, 0.71, 0.80, 0.86])
    assert code == 1 and not rec["pass"]


def test_parity_gate_beating_the_block_passes(monkeypatch, capsys):
    code, rec = _run(monkeypatch, capsys, [0.6, 0.8, 0.9, 0.95])
    assert code == 0 and rec["pass"]


def test_parity_gate_no_aucs_fails(monkeypatch, capsys):
    code, rec = _run(monkeypatch, capsys, None)
    assert code == 1 and not rec["pass"]
