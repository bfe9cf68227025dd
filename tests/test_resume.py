"""Auto-resume: a preempted run restarted with ``AwesomeConfig.resume``
continues from the newest full train-state checkpoint and is BIT-IDENTICAL
to an uninterrupted run.

The reference can only reload checkpoints post-hoc for analytics
(`awesome/agent/torch_agent.py:1090-1136` from_acc/load_acc) — mid-run
resume is a production capability the TPU rebuild adds (preemptible
slices). The full NamedTuple train state (params, optimizer moments,
plateau schedule, absolute epoch counters) rides the AgentCheckpoint;
the tracker (including its best-model gate) restores from the metadata.
"""
import os

import numpy as np
import pytest

from awesome_tpu.runner.config import AwesomeConfig
from awesome_tpu.runner.runner import AwesomeRunner


def _config(tmp_path, folder, **kw):
    base = dict(
        name_experiment="resume",
        dataset_args={"n": 3, "h": 24, "w": 24},
        segmentation_model_args={"n_hidden": 16},
        prior_model_args={"n_hidden": 12, "n_hidden_layers": 1},
        optimizer_type="adam",
        optimizer_args={"lr": 0.02},
        num_epochs=40,
        compute_metrics_during_training_nth_epoch=20,
        # cross a phase boundary AFTER the resume point so the absolute
        # epoch counters in the restored state are load-bearing
        use_extra_penalty_hook=True,
        extra_penalty_after_n_epochs=20,
        use_lr_on_plateau_scheduler=True,
        runs_path=str(tmp_path),
        output_folder=str(tmp_path / folder),
        seed=5,
    )
    base.update(kw)
    return AwesomeConfig(**base)


def _leaves(tree):
    import jax

    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


@pytest.mark.parametrize("mode", ["single", "multi"])
def test_resume_bit_identical(tmp_path, mode):
    kw = {}
    if mode == "multi":
        kw["segmentation_training_mode"] = "multi"

    # uninterrupted 40-epoch run
    full = AwesomeRunner(_config(tmp_path, "full", **kw))
    full.build()
    res_full = full.train()

    # preempted at epoch 20 (the nth-epoch 'latest'/'end' saves carry the
    # full train state), then restarted with resume=True
    part = AwesomeRunner(_config(tmp_path, "part", num_epochs=20, **kw))
    part.build()
    part.train()
    ck = os.path.join(part.output_folder, "checkpoints")
    assert os.path.isdir(os.path.join(ck, "end"))

    resumed = AwesomeRunner(
        _config(tmp_path, "part", resume=True, **kw)
    )
    resumed.build()
    res_resumed = resumed.train()

    # params after 40 epochs: bitwise equal to the uninterrupted run
    for a, b in zip(
        _leaves(full.stacked_params), _leaves(resumed.stacked_params)
    ):
        np.testing.assert_array_equal(a, b)
    # the post-resume loss trajectory equals the uninterrupted second half
    lf = res_full["loss_hist"]
    lr_ = res_resumed["loss_hist"]
    np.testing.assert_array_equal(lf[:, -lr_.shape[1]:], lr_)
    # tracker continued, not restarted: epochs accumulated to 40
    assert resumed.tracker.epoch == full.tracker.epoch == 40


def test_resume_restores_best_gate(tmp_path):
    part = AwesomeRunner(_config(tmp_path, "gate", num_epochs=20))
    part.build()
    part.train()
    best_before = part.tracker._best_primary
    assert best_before is not None

    resumed = AwesomeRunner(_config(tmp_path, "gate", resume=True))
    resumed.build()
    resumed.train()
    # the restored gate kept the pre-preemption best (it can only improve)
    if resumed.tracker.maximize_primary:
        assert resumed.tracker._best_primary >= best_before
    else:
        assert resumed.tracker._best_primary <= best_before


def test_resume_without_checkpoint_starts_fresh(tmp_path):
    runner = AwesomeRunner(
        _config(tmp_path, "fresh", resume=True, num_epochs=20)
    )
    runner.build()
    res = runner.train()
    assert np.isfinite(res["loss_hist"]).all()
    assert res["loss_hist"].shape[1] == 20


def test_resume_rejects_misaligned_cadence(tmp_path):
    # 'latest' saves only happen at multiples of CHECKPOINT_NTH_EPOCH=20 and
    # any seg_len divides 20, so only an 'end' checkpoint (written at
    # num_epochs, here 30 with seg_len=5) can land off the new grid
    part = AwesomeRunner(
        _config(
            tmp_path, "mis", num_epochs=30,
            compute_metrics_during_training_nth_epoch=15,
        )
    )
    part.build()
    part.train()
    # the resumed config's seg_len is gcd(40, 20) = 20, which does not
    # divide the end-checkpoint epoch 30
    bad = AwesomeRunner(_config(tmp_path, "mis", resume=True, num_epochs=40))
    bad.build()
    with pytest.raises(ValueError, match="not aligned"):
        bad.train()


def test_resume_complete_unaligned_noop(tmp_path):
    """A COMPLETE run resumed under a different cadence must no-op (the
    ep >= num_epochs check runs before the alignment check), keep the
    TRUE epoch, and never crash with 'not aligned'."""
    part = AwesomeRunner(
        _config(
            tmp_path, "done", num_epochs=30,
            compute_metrics_during_training_nth_epoch=15,
        )
    )
    part.build()
    part.train()

    # seg_len under the new config is 20; 30 % 20 != 0, but 30 >= 20
    # means nothing is left to train — clean no-op, not a ValueError
    resumed = AwesomeRunner(
        _config(tmp_path, "done", resume=True, num_epochs=20)
    )
    resumed.build()
    res = resumed.train()
    assert res["loss_hist"].shape[1] == 0  # zero extra epochs
    # the re-saved 'end' keeps the true epoch so later resumes stay honest
    import json

    with open(os.path.join(
        resumed.output_folder, "checkpoints", "end", "meta.json"
    )) as f:
        assert json.load(f)["extra"]["epoch"] == 30


def test_resume_best_checkpoint_old_twin(tmp_path):
    """A preemption during the atomic 'best' save leaves only the
    ``best.old`` crash twin — resume must restore the best params from
    the twin, not silently lose the best model."""
    part = AwesomeRunner(_config(tmp_path, "twin", num_epochs=20))
    part.build()
    part.train()
    ck = os.path.join(part.output_folder, "checkpoints")
    assert os.path.isdir(os.path.join(ck, "best"))
    # simulate the atomic_dir crash window: best/ renamed away, tmp lost
    os.rename(os.path.join(ck, "best"), os.path.join(ck, "best.old"))

    resumed = AwesomeRunner(
        _config(tmp_path, "twin", resume=True, num_epochs=20)
    )
    resumed.build()
    resumed.train()  # complete: no-op resume, restore only
    assert resumed.best_params is not None
    for a, b in zip(_leaves(part.best_params), _leaves(resumed.best_params)):
        np.testing.assert_array_equal(a, b)


def test_fbms_joint_resume_bit_identical(tmp_path):
    """The FBMS joint loop resumes from its nth-epoch 'latest' full-state
    saves (params + both optimizers' moments + seg batch-norm state +
    host LR-schedule state + batch-plan stream position) bit-identically."""
    from awesome_tpu.runner.fbms_runner import (
        FBMSExperimentConfig,
        FBMSRunner,
    )
    from tests.test_fbms import _write_sequence

    seq = _write_sequence(tmp_path)

    def make_runner():
        cfg = FBMSExperimentConfig(
            dataset_path=str(seq), prior_hidden_units=8, prior_flows=2,
            convex_hidden_units=12, convex_hidden_layers=1,
        )
        r = FBMSRunner(cfg)
        r.build()
        return r

    # a stepping scheduler makes the restored sched state load-bearing
    sched = {"type": "step", "gamma": 0.5, "step_size": 2}
    full = make_runner()
    full.train_joint(num_epochs=6, batch_size=2, lr=1e-3, prior_lr=1e-3,
                     scheduler=dict(sched), eval_nth_epoch=3)

    ck = str(tmp_path / "joint_ck")
    part = make_runner()
    part.train_joint(num_epochs=3, batch_size=2, lr=1e-3, prior_lr=1e-3,
                     scheduler=dict(sched), eval_nth_epoch=3,
                     checkpoint_dir=ck)
    resumed = make_runner()
    res = resumed.train_joint(num_epochs=6, batch_size=2, lr=1e-3,
                              prior_lr=1e-3, scheduler=dict(sched),
                              eval_nth_epoch=3, checkpoint_dir=ck,
                              resume=True)
    # only the post-resume epochs ran
    assert len(res["loss"]) == 3 * 3  # 3 epochs x 3 batches of 2
    for a, b in zip(_leaves(tuple(full.joint_state)),
                    _leaves(tuple(resumed.joint_state))):
        np.testing.assert_array_equal(a, b)
    assert res["final_lr_scale"] == 0.5 ** 3  # sched state carried over
    # tracker continued: eval ticks at epochs 3 (restored) and 6 (new)
    s = resumed.joint_tracker.series[
        ("MeanForegroundBinaryMIOU", "epoch", "eval")]
    assert s.steps == [3, 6], s.steps


def test_fbms_multi_object_resume_bit_identical(tmp_path):
    """The MULTI-object joint loop resumes bit-identically too — including
    across a growth event that happened BEFORE the preemption point: the
    restored state carries the grown active mask + refitted children, and
    grow_at_epoch entries below start_epoch are not replayed (state_kind
    'multi' checkpoints are invisible to single-object resume and vice
    versa)."""
    from awesome_tpu.runner.fbms_runner import (
        FBMSExperimentConfig,
        FBMSRunner,
    )
    from tests.test_multi_object_joint import _write_two_object_sequence

    seq = _write_two_object_sequence(tmp_path)

    def make_runner():
        cfg = FBMSExperimentConfig(
            dataset_path=seq, prior_hidden_units=8, prior_flows=2,
            convex_hidden_units=12, convex_hidden_layers=1,
        )
        r = FBMSRunner(cfg)
        r.build()
        return r

    kw = dict(
        max_objects=2, initial_count=1, grow_at_epoch={1: 2},
        batch_size=2, lr=1e-3, prior_lr=1e-3, pretrain_steps=30,
        scheduler={"type": "step", "gamma": 0.5, "step_size": 2},
        eval_nth_epoch=2,
    )
    full = make_runner()
    full.train_joint_multi_object(num_epochs=4, **kw)

    ck = str(tmp_path / "multi_ck")
    part = make_runner()
    part.train_joint_multi_object(num_epochs=2, checkpoint_dir=ck, **kw)
    resumed = make_runner()
    res = resumed.train_joint_multi_object(
        num_epochs=4, checkpoint_dir=ck, resume=True, **kw
    )
    # only the post-resume epochs ran (2 epochs x 2 batches of 2)
    assert len(res["loss"]) == 2 * 2
    # the growth event predates the resume point: not replayed
    assert res["growth_events"] == []
    for a, b in zip(_leaves(tuple(full.multi_state)),
                    _leaves(tuple(resumed.multi_state))):
        np.testing.assert_array_equal(a, b)
    # tracker continued: eval ticks at epochs 2 (restored) and 4 (new)
    s = resumed.joint_tracker.series[
        ("MeanForegroundBinaryMIOU", "epoch", "eval")]
    assert s.steps == [2, 4], s.steps
    # a single-object resume attempt must NOT pick up 'multi' checkpoints
    other = make_runner()
    out = other.train_joint(num_epochs=1, batch_size=2, lr=1e-3,
                            prior_lr=1e-3, checkpoint_dir=ck, resume=True)
    assert len(out["loss"]) == 2  # started fresh at epoch 0


def test_load_tag_with_twin_torn_primary_falls_back(tmp_path):
    """A torn PRIMARY tag (meta present, pytree unreadable) must fall
    through to the ``.old`` twin rather than fail or return None."""
    import json

    from awesome_tpu.fit.checkpoint import load_tag_with_twin, save_pytree

    base = tmp_path / "ck"
    good = np.arange(4.0)
    for d, arr in (("best.old", good), ("best", good + 1)):
        (base / d).mkdir(parents=True)
        save_pytree((arr,), str(base / d / "params"))
        with open(base / d / "meta.json", "w") as f:
            json.dump({"extra": {}}, f)
    # tear the primary's payload: meta survives, pytree is garbage
    # (Orbax saves a directory — empty it; npz fallback — corrupt the file)
    pp = base / "best" / "params"
    if pp.is_dir():
        import shutil

        shutil.rmtree(pp)
        pp.mkdir()
    else:
        (base / "best" / "params.npz").write_bytes(b"torn")
    got = load_tag_with_twin(str(base), "best", "params", (good,))
    assert got is not None
    np.testing.assert_array_equal(np.asarray(got[0]), good)

    # neither directory readable -> None, not an exception
    assert load_tag_with_twin(str(base), "nope", "params", (good,)) is None


def test_pytree_exists_orbax_dir_unreadable_without_orbax(tmp_path,
                                                          monkeypatch):
    """An Orbax-directory checkpoint must register as ABSENT when Orbax
    is unusable in this process (multi-process run — `_try_orbax`
    disables it to avoid barrier deadlocks — or missing dep), so a
    cross-format resume degrades to a fresh start instead of
    find_resumable accepting a checkpoint load_pytree then crashes on
    (np.load FileNotFoundError on the missing .npz twin)."""
    from awesome_tpu.fit import checkpoint as ck

    tree = (np.arange(3.0),)
    # orbax-format save (directory), as a single-process run produces
    ck.save_pytree(tree, str(tmp_path / "params"))
    if not (tmp_path / "params").is_dir():
        pytest.skip("orbax unavailable: save fell back to npz")
    assert ck.pytree_exists(str(tmp_path / "params"))

    # simulate the multi-process configuration
    monkeypatch.setattr(ck, "_try_orbax", lambda: None)
    assert not ck.pytree_exists(str(tmp_path / "params"))
    with pytest.raises(RuntimeError, match="Orbax directory"):
        ck.load_pytree(str(tmp_path / "params"), tree)
    # npz-format checkpoints stay fully readable in that mode
    ck.save_pytree(tree, str(tmp_path / "p2"))
    assert ck.pytree_exists(str(tmp_path / "p2"))
    np.testing.assert_array_equal(
        np.asarray(ck.load_pytree(str(tmp_path / "p2"), tree)[0]),
        tree[0])


def test_find_resumable_torn_meta_old_twin_and_kind(tmp_path):
    """The checkpoint scanner is preemption-proof: torn meta.json is
    skipped (never fatal), the `.old` crash-window twin left by an
    interrupted atomic swap is found, and state kinds never cross."""
    from awesome_tpu.fit.checkpoint import (
        atomic_dir,
        find_resumable,
        save_pytree,
    )
    import json

    def write_ck(d, extra):
        os.makedirs(d, exist_ok=True)
        save_pytree((np.zeros(2),), os.path.join(d, "train_state"))
        with open(os.path.join(d, "meta.json"), "w") as f:
            json.dump({"extra": extra}, f)

    base = str(tmp_path / "ck")
    write_ck(os.path.join(base, "end"),
             {"epoch": 4, "state_kind": "joint"})
    # 'latest' meta torn mid-write: must be skipped, 'end' wins
    write_ck(os.path.join(base, "latest"),
             {"epoch": 8, "state_kind": "joint"})
    with open(os.path.join(base, "latest", "meta.json"), "w") as f:
        f.write('{"extra": {"epo')  # truncated
    got = find_resumable(base, "joint")
    assert got is not None and got[0] == 4

    # crash window: 'latest' was renamed to '.old' but the new save
    # never landed — the twin must be picked up
    os.rename(os.path.join(base, "latest"),
              os.path.join(base, "latest.old"))
    write_ck(os.path.join(base, "latest.old"),
             {"epoch": 6, "state_kind": "joint"})
    got = find_resumable(base, "joint")
    assert got is not None and got[0] == 6

    # kind mismatch is invisible
    assert find_resumable(base, "multi") is None

    # atomic swap leaves no .tmp/.old residue and the result is complete
    tag = os.path.join(base, "atomic")
    for epoch in (2, 4):
        with atomic_dir(tag) as tmp:
            write_ck(tmp, {"epoch": epoch, "state_kind": "joint"})
    assert not os.path.exists(tag + ".tmp")
    assert not os.path.exists(tag + ".old")
    got = find_resumable(base, "joint", tags=("atomic",))
    assert got is not None and got[0] == 4


def test_resume_stopped_early_trains_nothing(tmp_path):
    """A watchdog-stopped run records stopped_early; restarting it with
    resume=True trains ZERO extra epochs (otherwise every preemption
    restart of a converged run would mutate the model by one epoch)."""
    from awesome_tpu.runner.fbms_runner import (
        FBMSExperimentConfig,
        FBMSRunner,
    )
    from tests.test_fbms import _write_sequence

    seq = _write_sequence(tmp_path)

    def make_runner():
        cfg = FBMSExperimentConfig(
            dataset_path=str(seq), prior_hidden_units=8, prior_flows=2,
            convex_hidden_units=12, convex_hidden_layers=1,
        )
        r = FBMSRunner(cfg)
        r.build()
        return r

    ck = str(tmp_path / "stop_ck")
    kw = dict(batch_size=2, lr=1e-3, prior_lr=1e-3, checkpoint_dir=ck,
              scheduler={"type": "step", "gamma": 0.5, "step_size": 1},
              watchdog_lr=2.5e-4)  # fires once lr_scale decays to 0.25
    stopped = make_runner()
    res = stopped.train_joint(num_epochs=6, **kw)
    assert res["stopped_early"] is True
    n_epochs_ran = len(res["loss"]) // 3  # 3 batches of 2 per epoch
    assert 0 < n_epochs_ran < 6

    resumed = make_runner()
    res2 = resumed.train_joint(num_epochs=6, resume=True, **kw)
    assert res2["stopped_early"] is True
    assert res2["loss"] == []  # nothing trained on restart
    for a, b in zip(_leaves(tuple(stopped.joint_state)),
                    _leaves(tuple(resumed.joint_state))):
        np.testing.assert_array_equal(a, b)


def test_resume_shrunken_num_epochs_keeps_true_epoch(tmp_path):
    """Resuming a completed 40-epoch run with num_epochs=20 must train
    nothing AND must not relabel the epoch-40 state as epoch 20 (a later
    40-epoch resume would otherwise train 20 extra epochs)."""
    import json

    part = AwesomeRunner(_config(tmp_path, "shrunk", num_epochs=40))
    part.build()
    part.train()

    resumed = AwesomeRunner(
        _config(tmp_path, "shrunk", resume=True, num_epochs=20)
    )
    resumed.build()
    res = resumed.train()
    assert res["loss_hist"].shape[1] == 0  # nothing trained
    for a, b in zip(_leaves(part.stacked_params),
                    _leaves(resumed.stacked_params)):
        np.testing.assert_array_equal(a, b)
    with open(os.path.join(resumed.output_folder, "checkpoints", "end",
                           "meta.json")) as f:
        meta = json.load(f)
    assert meta["extra"]["epoch"] == 40  # true epoch preserved


def test_joint_emergency_dump_on_failure(tmp_path, monkeypatch):
    """An unexpected error inside joint training dumps the newest
    host-visible state + traceback under <checkpoint_dir>/emergency
    before re-raising (reference torch_agent.py:1063 emergency_save)."""
    import json

    from awesome_tpu.runner.fbms_runner import (
        FBMSExperimentConfig,
        FBMSRunner,
    )
    from tests.test_fbms import _write_sequence

    seq = _write_sequence(tmp_path)
    cfg = FBMSExperimentConfig(
        dataset_path=str(seq), prior_hidden_units=8, prior_flows=2,
        convex_hidden_units=12, convex_hidden_layers=1,
    )
    runner = FBMSRunner(cfg)
    runner.build()
    monkeypatch.setattr(
        FBMSRunner, "evaluate_joint",
        lambda self, **kw: (_ for _ in ()).throw(RuntimeError("boom")),
    )
    ck = str(tmp_path / "em_ck")
    with pytest.raises(RuntimeError, match="boom"):
        runner.train_joint(num_epochs=2, batch_size=2, lr=1e-3,
                           prior_lr=1e-3, eval_nth_epoch=1,
                           checkpoint_dir=ck)
    em = os.path.join(ck, "emergency")
    with open(os.path.join(em, "emergency.json")) as f:
        meta = json.load(f)
    assert "boom" in meta["error"]
    assert "evaluate_joint" in meta["traceback"]
    from awesome_tpu.fit.checkpoint import pytree_exists

    assert pytree_exists(os.path.join(em, "params"))


def test_joint_emergency_dump_without_eval_cadence(tmp_path, monkeypatch):
    """A crash MID-LOOP with no eval/plot cadence still dumps the newest
    train state: the loop keeps ``self.joint_state`` fresh every epoch,
    not only at eval ticks."""
    import json

    from awesome_tpu.runner.fbms_runner import (
        FBMSExperimentConfig,
        FBMSRunner,
    )
    import awesome_tpu.fit.trainer as trainer_mod
    from tests.test_fbms import _write_sequence

    seq = _write_sequence(tmp_path)
    cfg = FBMSExperimentConfig(
        dataset_path=str(seq), prior_hidden_units=8, prior_flows=2,
        convex_hidden_units=12, convex_hidden_layers=1,
    )
    runner = FBMSRunner(cfg)
    runner.build()
    real = trainer_mod.epoch_batches
    calls = {"n": 0}

    def boom(*a, **kw):
        calls["n"] += 1
        if calls["n"] >= 2:  # epoch 1 trains, epoch 2 crashes
            raise RuntimeError("mid-loop boom")
        return real(*a, **kw)

    monkeypatch.setattr(trainer_mod, "epoch_batches", boom)
    ck = str(tmp_path / "em_ck2")
    with pytest.raises(RuntimeError, match="mid-loop boom"):
        runner.train_joint(num_epochs=3, batch_size=2, lr=1e-3,
                           prior_lr=1e-3, checkpoint_dir=ck)
    em = os.path.join(ck, "emergency")
    with open(os.path.join(em, "emergency.json")) as f:
        meta = json.load(f)
    assert "mid-loop boom" in meta["error"]
    from awesome_tpu.fit.checkpoint import pytree_exists

    assert pytree_exists(os.path.join(em, "params"))


def test_cli_resume_folder_pickup(tmp_path, monkeypatch):
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "run_script",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "run.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["run_script"] = spec.loader.exec_module(mod) or mod

    # two timestamped run folders; only the newer has checkpoints
    old = tmp_path / "2020-01-01_00-00-00_resume"
    new = tmp_path / "2021-01-01_00-00-00_resume"
    (old / "checkpoints").mkdir(parents=True)
    (new / "checkpoints").mkdir(parents=True)
    cfg = AwesomeConfig(
        name_experiment="resume", runs_path=str(tmp_path), resume=True
    )
    mod._resolve_resume_folder(cfg)
    assert cfg.output_folder == str(new)

    # a DIFFERENT experiment whose name merely ends with this one must
    # never be picked up, even if newer ('unet' vs 'refit_unet')
    trap = tmp_path / "2022-01-01_00-00-00_other_resume"
    (trap / "checkpoints").mkdir(parents=True)
    cfg3 = AwesomeConfig(
        name_experiment="resume", runs_path=str(tmp_path), resume=True
    )
    mod._resolve_resume_folder(cfg3)
    assert cfg3.output_folder == str(new)

    # no matching folder: stays fresh (None)
    cfg2 = AwesomeConfig(
        name_experiment="other", runs_path=str(tmp_path), resume=True
    )
    mod._resolve_resume_folder(cfg2)
    assert cfg2.output_folder is None


def test_cli_skip_pretrain_on_resume(tmp_path):
    """--resume with an existing resumable joint checkpoint skips the
    prior pretrain (the restored JointTrainState supersedes it) — but a
    pretrain_only run never skips, and a fresh resume (no checkpoint)
    still pretrains (train_joint would otherwise lose its prior init)."""
    import importlib.util
    import json
    import sys

    from awesome_tpu.fit.checkpoint import save_pytree

    spec = importlib.util.spec_from_file_location(
        "run_script2",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "run.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["run_script2"] = spec.loader.exec_module(mod) or mod

    out = tmp_path / "run"
    cfg = AwesomeConfig(output_folder=str(out), resume=True)
    # no checkpoint yet: must pretrain
    assert mod._skip_pretrain_on_resume(cfg) is False

    d = out / "checkpoints" / "latest"
    d.mkdir(parents=True)
    save_pytree((np.zeros(2),), str(d / "train_state"))
    with open(d / "meta.json", "w") as f:
        json.dump({"extra": {"epoch": 3, "state_kind": "joint"}}, f)
    assert mod._skip_pretrain_on_resume(cfg) is True
    # pretrain_only's deliverable IS the pretrain: never skipped
    cfg.pretrain_only = True
    assert mod._skip_pretrain_on_resume(cfg) is False
    cfg.pretrain_only = False
    cfg.resume = False
    assert mod._skip_pretrain_on_resume(cfg) is False
    # cross-kind stale checkpoint must NOT skip: a 'multi' checkpoint
    # cannot seed a single-object joint resume (and vice versa) — the
    # pretrain would be skipped while the resume finds nothing
    cfg.resume = True
    with open(d / "meta.json", "w") as f:
        json.dump({"extra": {"epoch": 3, "state_kind": "multi"}}, f)
    assert mod._skip_pretrain_on_resume(cfg) is False
    cfg.dataset_args = {
        "dataset": {"label_mode": {"value": "multiple_objects"}}
    }
    assert mod._skip_pretrain_on_resume(cfg) is True
