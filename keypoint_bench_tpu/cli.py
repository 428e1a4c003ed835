"""CLI entry point: `python -m keypoint_bench_tpu.cli -c config.yaml test`
(mirrors the reference invocation `python3 main.py -c config.yaml test`,
main.py:1-12, minus Lightning)."""
from __future__ import annotations

import argparse
import json
import sys

from keypoint_bench_tpu.runner import EvalConfig, Evaluator


def main(argv=None):
    ap = argparse.ArgumentParser(prog="keypoint_bench_tpu")
    ap.add_argument("-c", "--config", required=True, help="YAML config path")
    ap.add_argument("command", nargs="?", default="test",
                    choices=["test"], help="subcommand (test)")
    args = ap.parse_args(argv)

    cfg = EvalConfig.from_yaml(args.config)
    results = Evaluator(cfg).run()
    print(json.dumps({k: v for k, v in results.items()
                      if isinstance(v, (int, float, str))}, default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
