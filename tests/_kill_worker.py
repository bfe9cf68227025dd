"""Subprocess worker for the adversarial preemption test
(tests/test_resume_kills.py).

Trains one of the three resumable loops (pixel / FBMS joint /
multi-object joint) with ``resume=True`` so the parent test can SIGKILL
this process at arbitrary points — including inside checkpoint writes —
and simply relaunch it until it completes. Exit code 0 means training
ran to the end. The parent then asserts the final 'end' checkpoint is
bit-identical to an uninterrupted run's.

Semantics under test: `awesome_tpu/fit/checkpoint.py` atomic_dir /
find_resumable / restore_resumable (the reference has no mid-run resume
at all — `awesome/agent/torch_agent.py:1090-1136` only reloads params
post-hoc).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

SCHED = {"type": "step", "gamma": 0.5, "step_size": 2}


def _mark(workdir: str) -> None:
    # training (not interpreter startup) begins now — the parent samples
    # kill delays from this marker so kills land in train/checkpoint code
    with open(os.path.join(workdir, "started"), "w") as f:
        f.write(str(os.getpid()))


def main() -> None:
    mode, workdir, num_epochs = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import jax

    jax.config.update("jax_platforms", "cpu")

    if mode == "pixel":
        from awesome_tpu.runner.config import AwesomeConfig
        from awesome_tpu.runner.runner import AwesomeRunner

        AwesomeRunner.CHECKPOINT_NTH_EPOCH = 5
        cfg = AwesomeConfig(
            name_experiment="kill",
            dataset_args={"n": 3, "h": 24, "w": 24},
            segmentation_model_args={"n_hidden": 16},
            prior_model_args={"n_hidden": 12, "n_hidden_layers": 1},
            optimizer_type="adam",
            optimizer_args={"lr": 0.02},
            num_epochs=num_epochs,
            use_lr_on_plateau_scheduler=True,
            runs_path=workdir,
            output_folder=os.path.join(workdir, "run"),
            seed=5,
            resume=True,
        )
        r = AwesomeRunner(cfg)
        r.build()
        _mark(workdir)
        r.train()
        return

    from awesome_tpu.runner.fbms_runner import (
        FBMSExperimentConfig,
        FBMSRunner,
    )

    seq = os.path.join(
        workdir, "data", "cars99" if mode == "joint" else "marple99"
    )
    cfg = FBMSExperimentConfig(
        dataset_path=seq, prior_hidden_units=8, prior_flows=2,
        convex_hidden_units=12, convex_hidden_layers=1,
    )
    r = FBMSRunner(cfg)
    r.build()
    _mark(workdir)
    ck = os.path.join(workdir, "ck")
    if mode == "joint":
        r.train_joint(
            num_epochs=num_epochs, batch_size=2, lr=1e-3, prior_lr=1e-3,
            scheduler=dict(SCHED), eval_nth_epoch=3, checkpoint_dir=ck,
            resume=True,
        )
    elif mode == "multi":
        r.train_joint_multi_object(
            num_epochs=num_epochs, max_objects=2, initial_count=1,
            grow_at_epoch={1: 2}, batch_size=2, lr=1e-3, prior_lr=1e-3,
            pretrain_steps=30, scheduler=dict(SCHED), eval_nth_epoch=2,
            checkpoint_dir=ck, resume=True,
        )
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
