"""End-to-end script tests: train -> inference -> evaluate on a tiny
synthetic dataset (in-process, debug dims)."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

from test_mtl import DEBUG_DIMS, _config, _write_dataset

from asr_ttl_mtl_tpu.mtl import DataLoader, MultiTaskSpeechDataset, MultiTaskTrainer

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")


def _import_script(name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(SCRIPTS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("scripts")
    csv = _write_dataset(tmp_path)
    cfg = _config(tmp_path, csv, epochs=1)
    trainer = MultiTaskTrainer(cfg, verbose=False)
    ds = MultiTaskSpeechDataset(csv, cfg)
    loader = DataLoader(ds, batch_size=4, num_workers=2, buckets=cfg.token_buckets)
    trainer.train(loader, loader)
    return tmp_path, csv, trainer, loader


def test_inference_script_pipeline(trained, capsys):
    tmp_path, csv, trainer, loader = trained
    inf = _import_script("inference_disease")

    results = inf.run_inference(trainer, loader)
    assert results["total_samples"] == 6
    assert 0.0 <= results["disease_accuracy"] <= 1.0
    assert set(results["per_class_metrics"]) == {"normal", "dysphonia", "dysarthria"}
    for r in results["inference_results"]:
        assert 0.0 <= r["disease_confidence"] <= 1.0
        assert abs(sum(r["all_disease_probs"].values()) - 1.0) < 1e-4

    extra = inf.calculate_additional_metrics(results)
    inf.print_results(results, extra)
    out = capsys.readouterr().out
    assert "Confusion Matrix" in out and "Overall WER" in out

    save_base = str(tmp_path / "results.csv")
    inf.save_results(results, extra, save_base)
    produced = [f for f in os.listdir(tmp_path) if f.startswith("results_")]
    assert any(f.endswith(".csv") for f in produced)
    assert any(f.endswith("_summary.json") for f in produced)
    summary = [f for f in produced if f.endswith("_summary.json")][0]
    data = json.load(open(tmp_path / summary))
    assert "overall_metrics" in data and "classification_metrics" in data


def test_evaluate_script_runs(trained, capsys, monkeypatch):
    tmp_path, csv, trainer, _ = trained
    ev = _import_script("evaluate_disease")
    out_json = str(tmp_path / "report.json")
    monkeypatch.setattr(
        sys, "argv",
        ["evaluate_disease.py", "--model_path", trainer.checkpoint_path(),
         "--csv", csv, "--batch_size", "4", "--output_json", out_json],
    )
    ev.main()
    out = capsys.readouterr().out
    assert "EVALUATION REPORT" in out
    report = json.load(open(out_json))
    assert "loss" in report
