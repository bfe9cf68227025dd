#!/usr/bin/env python
"""Run a single experiment from a config.

UX parity with the reference CLI (`scripts/run.py:30-77`,
`docs/reproduction_guide.md:52-66`):

    python scripts/run.py --config-path config/my_experiment.yaml \
        [--num-epochs 100 ...any config field as a flag...]
"""
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def config_logging() -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )


def get_config():
    from awesome_tpu.runner.config import AwesomeConfig

    parser = AwesomeConfig.get_parser()
    parser.add_argument("--config-path", type=str, default=None)
    args = parser.parse_args()
    if args.config_path:
        cfg = AwesomeConfig.load(args.config_path)
    else:
        cfg = AwesomeConfig()
    cfg.apply_parsed_args(args)
    cfg.prepare()
    return cfg


def main(cfg) -> None:
    from awesome_tpu.runner.runner import AwesomeRunner
    from awesome_tpu.utils.tensorboard import Tensorboard

    runner = AwesomeRunner(cfg)
    runner.build()
    runner.store_config()
    if cfg.do_pretraining:
        logging.info("Pretraining (prior fit) ...")
        runner.pretrain()
        if cfg.pretrain_only:
            out = runner.save_results()
            logging.info("pretrain_only: results in %s", out)
            return
    logging.info("Training %s (%d images, %d epochs)",
                 cfg.run_name, len(runner.samples), cfg.num_epochs)
    runner.train()
    metrics = runner.evaluate()
    logging.info("Eval: %s", metrics)
    out = runner.save_results()
    tb = Tensorboard(os.path.join(out, "tb"))
    tb.attach_to_tracker(runner.tracker)
    tb.log_config_markdown(cfg)
    tb.close()
    logging.info("Results in %s", out)


if __name__ == "__main__":
    config_logging()
    main(get_config())
