#!/usr/bin/env python
"""Detailed evaluation report for a trained multi-task checkpoint.

The reference's `scripts/evaluate_disease.py` is stale/broken (it imports a
`collate_fn` symbol that does not exist and calls a missing
`trainer.evaluate_detailed`; see SURVEY.md §2.3). This is a working
implementation of its *intended* richer report: trainer-style corpus metrics
(detailed_metrics) on any split, plus the per-class transcription breakdown.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from asr_ttl_mtl_tpu.mtl import DataLoader, MultiTaskSpeechDataset, MultiTaskTrainer  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description="Multi-Task Model Evaluation (TPU)")
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--csv", type=str, required=True, help="split CSV to evaluate")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--output_json", type=str, default=None)
    args = parser.parse_args()

    trainer = MultiTaskTrainer.load_from_checkpoint(args.model_path)
    dataset = MultiTaskSpeechDataset(args.csv, trainer.config)
    loader = DataLoader(dataset, args.batch_size, shuffle=False, num_workers=4)
    print(f"Evaluating {len(dataset)} samples from {args.csv}")

    metrics = trainer.evaluate(loader)

    print(f"\n{'=' * 70}\n{'EVALUATION REPORT':^70}\n{'=' * 70}")
    print(f"Loss: {metrics['loss']:.4f} (cls {metrics['cls_loss']:.4f}, "
          f"trans {metrics['trans_loss']:.4f})")
    if "disease_acc" in metrics:
        print(f"Disease accuracy: {metrics['disease_acc']:.4f}")
        print(f"Macro F1: {metrics['macro_f1']:.4f}  Weighted F1: {metrics['weighted_f1']:.4f}")
    if "wer" in metrics:
        print(f"Corpus WER: {metrics['wer']:.4f}  CER: {metrics['cer']:.4f}")
    if metrics.get("per_class_transcription"):
        print(f"\n{'Class':<12} {'WER':<7} {'CER':<7} {'Samples':<8}")
        print("-" * 36)
        for name, m in metrics["per_class_transcription"].items():
            print(f"{name.capitalize():<12} {m['wer']:<7.4f} {m['cer']:<7.4f} {m['samples']:<8}")

    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(metrics, f, indent=2, default=lambda o: np.asarray(o).tolist())
        print(f"\nReport saved: {args.output_json}")


if __name__ == "__main__":
    main()
