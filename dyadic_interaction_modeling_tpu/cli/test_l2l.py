"""Checkpoint-free scoring of exported predictions
(reference: ``code/test_l2l.py``): loads a predictions pickle (as written by
test_s2s_pretrain) and prints the metric battery against the stored ground
truth."""

from __future__ import annotations

import pickle

from ..metrics.reporting import print_metrics, print_metrics_full
from .common import get_parser, setup


def main(argv=None):
    parser = get_parser("score exported listener predictions")
    parser.add_argument("--predictions", type=str,
                        default="l2l_listener_predictions.pkl")
    args = parser.parse_args(argv)
    logger = setup(args)
    with open(args.predictions, "rb") as f:
        payload = pickle.load(f)
    y_true, y_pred, xs = payload["y_true"], payload["y_pred"], payload["x"]
    logger.info(f"scoring {len(y_true)} clips from {args.predictions}")
    print_metrics(y_true, y_pred, xs)
    print_metrics_full(y_true, y_pred, xs)


if __name__ == "__main__":
    main()
