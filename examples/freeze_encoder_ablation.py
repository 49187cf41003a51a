"""The reference's experiment-generation ablation as one script.

Reference run_ipynb generations (SURVEY.md §2.4 / BASELINE.md trend table):
frozen encoder (the early `_exp` runs, tiny WER 0.119) vs trainable encoder
(the final `_encoder_learn*` runs, tiny WER 0.098). This runs both
configurations back to back on the same data and prints the comparison.

Usage: DATA_DIR=../data python examples/freeze_encoder_ablation.py [--model_size tiny]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_size", default="tiny")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--data_dir", default=os.environ.get("DATA_DIR", "../data"))
    p.add_argument("--save_dir", default="checkpoints/ablation")
    args = p.parse_args()

    from asr_ttl_mtl_tpu.mtl import MultiTaskTrainer, TrainingConfig
    from asr_ttl_mtl_tpu.mtl.dataset import DataLoader, MultiTaskSpeechDataset

    results = {}
    for freeze in (True, False):
        tag = "frozen" if freeze else "trainable"
        config = TrainingConfig(
            model_size=args.model_size,
            epochs=args.epochs,
            freeze_encoder=freeze,
            train_csv=os.path.join(args.data_dir, "custom_train.csv"),
            val_csv=os.path.join(args.data_dir, "custom_val.csv"),
            save_dir=os.path.join(args.save_dir, tag),
        )
        train_ds = MultiTaskSpeechDataset(config.train_csv, config)
        val_ds = MultiTaskSpeechDataset(config.val_csv, config, tokenizer=train_ds.tokenizer)
        trainer = MultiTaskTrainer(config)
        trainer.train(
            DataLoader(train_ds, config.batch_size, shuffle=True),
            DataLoader(val_ds, config.val_batch_size),
        )
        results[tag] = trainer.evaluate(DataLoader(val_ds, config.val_batch_size))

    print("\n=== freeze-encoder ablation ===")
    for tag, m in results.items():
        print(f"{tag:10s} val loss {m['loss']:.4f}  wer {m.get('wer', -1):.4f} "
              f"acc {m.get('disease_acc', 0):.4f}")


if __name__ == "__main__":
    main()
