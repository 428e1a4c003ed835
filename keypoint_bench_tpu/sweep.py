"""In-process model/sequence sweeps — replaces the reference's launcher
scripts (script/rep_task.py etc.) which rewrite YAML on disk and relaunch
main.py via subprocess per model (script/rep_task.py:9-30,
script/vo_task.py:43-65). Here a sweep is a loop over Evaluator configs in
one process; compiled stages are cached per (model, shape) by jax.jit.

Usage: python -m keypoint_bench_tpu.sweep -c configs/sweep_example.yaml
"""
from __future__ import annotations

import argparse
import copy
import json


def run_sweep(base_config: dict, models=None, sequences=None) -> dict:
    from keypoint_bench_tpu.runner import EvalConfig, Evaluator

    models = models or [base_config["model_type"]]
    sequences = sequences or [None]
    all_results = {}
    for model in models:
        for seq in sequences:
            cfg = copy.deepcopy(base_config)
            cfg["model_type"] = model
            key = model
            if seq is not None:
                cfg["data_params"].update(seq)
                key = f"{model}/{seq.get('name', seq)}"
            cfg["output_dir"] = f"{cfg.get('output_dir', 'output')}/{key}"
            print(f"=== sweep: {key} ===")
            try:
                res = Evaluator(EvalConfig.from_dict(cfg)).run()
                all_results[key] = {k: v for k, v in res.items()
                                    if isinstance(v, (int, float, str))}
            except FileNotFoundError as e:
                all_results[key] = {"error": str(e)}
    return all_results


def main(argv=None):
    import yaml
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    args = ap.parse_args(argv)
    with open(args.config) as f:
        spec = yaml.safe_load(f)
    results = run_sweep(spec["base"], spec.get("models"),
                        spec.get("sequences"))
    print(json.dumps(results, indent=2, default=float))


if __name__ == "__main__":
    main()
