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
        with open(args.config_path) as f:
            text = f.read()
        if "awesome." in text and "__class__" in text:
            # an UNMODIFIED reference YAML: route through the importer
            from awesome_tpu.runner.reference_import import (
                load_reference_config,
            )

            cfg, _ = load_reference_config(args.config_path)
        else:
            cfg = AwesomeConfig.load(args.config_path)
    else:
        cfg = AwesomeConfig()
    cfg.apply_parsed_args(args)
    cfg.prepare()
    return cfg


def _resolve_resume_folder(cfg) -> None:
    """--resume true without an explicit --output-folder: continue the
    NEWEST run of the same experiment (run folders are timestamped, so a
    preempted job restarted with the identical command + --resume picks
    up exactly where it left off; `AwesomeRunner._try_resume` restores
    the full train state bit-identically)."""
    import re

    if not getattr(cfg, "resume", False) or cfg.output_folder:
        return
    name = cfg.name_experiment or "run"
    # exact match on <timestamp>_<name_experiment> — a plain suffix glob
    # would let experiment 'unet' resume into a newer 'refit_unet' folder
    pat = re.compile(
        r"^\d{4}-\d{2}-\d{2}_\d{2}-\d{2}-\d{2}_" + re.escape(name) + r"$"
    )
    cands = sorted(
        os.path.join(cfg.runs_path, d)
        for d in (os.listdir(cfg.runs_path)
                  if os.path.isdir(cfg.runs_path) else [])
        if pat.match(d)
        and os.path.isdir(os.path.join(cfg.runs_path, d, "checkpoints"))
    )
    if cands:
        cfg.output_folder = cands[-1]
        logging.info("resume: picked up run folder %s", cands[-1])
    else:
        logging.info("resume: no prior run folder for %r — starting fresh",
                     name)


def _joint_state_kind(cfg) -> str:
    """The checkpoint kind this config's joint dispatch produces/consumes
    — delegates to the single source of truth next to the dispatch
    itself (``FBMSRunner.joint_state_kind``) so the CLI pretrain-skip
    predicate can never drift from the training routing."""
    from awesome_tpu.runner.fbms_runner import FBMSRunner

    return FBMSRunner.joint_state_kind(cfg)


def _skip_pretrain_on_resume(cfg) -> bool:
    """A resumable joint checkpoint supersedes the prior pretrain entirely
    (the restored JointTrainState carries the priors) — don't redo hours
    of prefit on every preemption restart. Never skips a pretrain_only
    run: its DELIVERABLE is the pretrain. Only a checkpoint of the kind
    THIS config dispatches to counts — a stale cross-kind checkpoint in
    the same folder must not skip a pretrain the resume can't restore."""
    from awesome_tpu.fit.checkpoint import find_resumable

    if not getattr(cfg, "resume", False) or cfg.pretrain_only:
        return False
    if not cfg.output_folder:
        return False
    ck = os.path.join(cfg.output_folder, "checkpoints")
    return bool(find_resumable(ck, _joint_state_kind(cfg)))


def _is_fbms(cfg) -> bool:
    """FBMS configs = the dataset TYPE (outer, or the nested wrapped
    dataset's class tag) is an FBMS sequence dataset — never a substring
    match on arbitrary arg values (paths may contain 'fbms')."""
    if "fbms" in (cfg.dataset_type or "").lower():
        return True
    inner = (cfg.dataset_args or {}).get("dataset")
    cls = inner.get("__class__", "") if isinstance(inner, dict) else ""
    return "fbms" in str(cls).lower()


def main_fbms(cfg) -> None:
    """FBMS experiment families route through FBMSRunner: spatio-temporal
    (shared (x,y,t) prior), pretrain_only (sequential / weight-decay /
    refit-prior-only) and joint (UNET+...+joint / refit-unet)."""
    from awesome_tpu.runner.fbms_runner import FBMSRunner

    runner = FBMSRunner.from_awesome_config(cfg)
    if not os.path.isdir(runner.config.dataset_path):
        raise SystemExit(
            f"FBMS sequence directory {runner.config.dataset_path!r} not "
            "found — download FBMS-59 (scripts/setup.py) or point "
            "dataset_args.dataset.dataset_path at a sequence directory"
        )
    runner.build()
    if (cfg.dataset_args or {}).get("spatio_temporal") or (
        cfg.prior_model_args or {}
    ).get("channels") == 3:
        res = runner.pretrain()
        logging.info("Spatio-temporal fit done: %s", res)
        logging.info("Eval: %s", runner.evaluate())
        return
    if cfg.do_pretraining:
        if _skip_pretrain_on_resume(cfg):
            logging.info("resume: joint checkpoint found — skipping "
                         "prior pretrain")
        else:
            res = runner.run_pretrain_only_from_config()
            logging.info("Prior pretrain: %s", res)
        if cfg.pretrain_only:
            return
    res = runner.train_joint_from_config()
    logging.info("Joint training done (%d losses)", len(res["loss"]))
    logging.info("Eval: %s", runner.evaluate_joint())


def main(cfg) -> None:
    from awesome_tpu.runner.runner import AwesomeRunner
    from awesome_tpu.utils.tensorboard import Tensorboard

    _resolve_resume_folder(cfg)
    if _is_fbms(cfg):
        main_fbms(cfg)
        return
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
