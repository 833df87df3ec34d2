#!/usr/bin/env python
"""Training CLI (reference train.py equivalent).

    python train.py fit --config configs/base.yaml [--config more.yaml]
                        [--set train.lr=0.1 --set data.batch_size=256]

Configs compose by later-file override; --set applies dotted overrides; the
final merged config is archived to <out_dir>/saved_config.yaml.
"""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("command", choices=["fit", "validate"], help="what to run")
    parser.add_argument("--config", action="append", default=[], help="YAML config (repeatable)")
    parser.add_argument("--set", dest="overrides", action="append", default=[],
                        help="dotted override, e.g. train.lr=0.1")
    args = parser.parse_args()

    import os

    import jax

    # persistent compilation cache: the full-recipe train step costs ~10 min
    # to compile on a 1-core host — resumes and re-runs shouldn't pay it twice
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vision_toolbox_tpu.train.config import load_config
    from vision_toolbox_tpu.train.trainer import Trainer

    cfg = load_config(args.config, args.overrides)
    trainer = Trainer(cfg)
    if args.command == "fit":
        trainer.fit()
    else:
        print(trainer.evaluate())


if __name__ == "__main__":
    main()
