"""Import ACTUAL reference YAML configs (read-only from /root/reference).

The strongest parity check available offline: the original experiment
files load, translate, and produce runnable configs."""
import glob
import os

import pytest

from awesome_tpu.runner.reference_import import load_reference_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REF = "/root/reference/config"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference configs not mounted"
)


def test_import_convexity_sequential_config():
    path = os.path.join(REF, "convexity/sequential/CNNET_benchmark+xy+convex.yaml")
    cfg, extra = load_reference_config(path)
    assert cfg.device == "tpu"
    assert cfg.dtype == "float32"
    assert cfg.num_epochs > 0
    # dataset/loss types translated to awesome_tpu (or left as strings)
    assert "torch" not in (cfg.optimizer_type or "")
    assert isinstance(extra, dict)


def test_import_fbms_joint_flagship_config():
    path = os.path.join(
        REF, "path-connectedness/joint/UNET+cars3+edge+diffeo+original+joint.yaml"
    )
    cfg, extra = load_reference_config(path)
    assert cfg.prior_model_type == (
        "awesome_tpu.nn.path_connected.real_nvp_path_connected_net"
    )
    assert cfg.prior_model_args["flow_output_fn"] == "tanh"
    assert cfg.prior_model_args["flow_n_flows"] == 12
    assert cfg.num_epochs == 15
    assert cfg.scribble_percentage == 0.8


def test_import_every_reference_config_parses():
    """Every YAML in the reference config tree loads without raising."""
    paths = glob.glob(os.path.join(REF, "**/*.yaml"), recursive=True)
    assert len(paths) > 10
    failures = []
    for p in paths:
        try:
            cfg, extra = load_reference_config(p)
            assert cfg.timestamp is not None
        except Exception as e:  # noqa: BLE001
            failures.append((os.path.relpath(p, REF), repr(e)))
    assert not failures, failures[:5]


def test_import_consumes_every_reference_field():
    """Completeness gate: NO reference field may silently land in
    ``extra``. Every key either maps to a live AwesomeConfig slot or the
    import fails this test — the enforcement of reference_import.py's
    "lossy-by-listing" promise. Nested agent_args must be fully lifted
    (any residual would mean an agent option we'd ignore)."""
    paths = glob.glob(os.path.join(REF, "**/*.yaml"), recursive=True)
    assert len(paths) > 200  # the reference ships 207 experiment YAMLs
    leftovers = {}
    residual_agent_args = {}
    for p in paths:
        cfg, extra = load_reference_config(p)
        if extra:
            leftovers[os.path.relpath(p, REF)] = sorted(extra)
        if cfg.agent_args:
            residual_agent_args[os.path.relpath(p, REF)] = sorted(
                cfg.agent_args
            )
    assert not leftovers, (
        f"{len(leftovers)} configs have unconsumed fields; "
        f"first: {next(iter(leftovers.items()))}"
    )
    assert not residual_agent_args, (
        f"unlifted agent_args keys: {next(iter(residual_agent_args.items()))}"
    )


def test_consumed_fields_are_live():
    """The round-3 'extra' keys now drive real machinery, not just slots:
    WN weight decay reaches the optimizer tree, gets_targets reaches the
    wrapper, the module type is parsed, out channels follow
    use_binary_classification."""
    import jax.numpy as jnp

    from awesome_tpu.fit.optim import wn_param_groups
    from awesome_tpu.fit.pixel_trainer import PixelTrainConfig
    from awesome_tpu.nn.wrapper import WrapperModule
    from awesome_tpu.runner.config import AwesomeConfig

    # config fields exist with reference defaults
    cfg = AwesomeConfig()
    assert cfg.use_binary_classification is True
    assert cfg.weight_decay_on_weight_norm_modules == 5e-5
    assert cfg.combined_segmentation_module_type.endswith("WrapperModule")

    # the WN decay tree targets exactly the magnitude leaves
    params = {"flow": {"g": jnp.ones(3), "v": jnp.ones((3, 3))}}
    tree = wn_param_groups(params, 5e-5)
    assert tree["flow"]["g"] == 5e-5 and tree["flow"]["v"] == 0.0
    assert PixelTrainConfig(wn_weight_decay=5e-5).wn_weight_decay == 5e-5

    # wrapper accepts the gets_targets switch
    assert hasattr(WrapperModule(segmentation_module=None),
                   "segmentation_module_gets_targets")


def test_agent_args_pretrain_fields_lifted():
    """The joint YAML nests pretrain orchestration in agent_args; the
    importer lifts the schema-known keys so do_pretraining /
    pretrain_args / pretrain_state_path are live config fields."""
    import os

    from awesome_tpu.runner.reference_import import load_reference_config

    path = ("/root/reference/config/path-connectedness/joint/"
            "UNET+cars3+edge+diffeo+original+joint.yaml")
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference configs not present")
    cfg, extra = load_reference_config(path)
    assert cfg.do_pretraining is True
    assert cfg.force_pretrain is False
    assert cfg.pretrain_args["num_epochs"] == 4000
    assert cfg.pretrain_args["reuse_state_epochs"] == 400
    assert cfg.pretrain_state_path.endswith(".pth")
    assert cfg.pretrain_only is False


def test_stratified_reference_configs_build(tmp_path):
    """One YAML per reference config directory BUILDS: importer -> runner
    routing -> dataset (synthetic replica) -> models at declared sizes ->
    stacked params + optimizer state (scripts/build_all_configs.py; the
    full 207-config sweep runs standing, runs/build_all/report.json)."""
    import json
    import subprocess
    import sys

    out = tmp_path / "report"
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
    })
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "build_all_configs.py"),
         "--stratified", "--out", str(out)],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    report = json.load(open(out / "report.json"))
    assert report["total"] == 9  # one per reference config directory
    assert report["ok"] == 9 and not report["failures"]


def test_stratified_reference_configs_train(tmp_path):
    """One YAML per reference config directory TRAINS end-to-end through
    the exact `scripts/run.py` routing (pretrain -> joint -> eval) with
    only step/epoch budgets shrunk — finite losses + in-range metrics
    asserted per config (scripts/build_all_configs.py --train; the full
    207-config sweep runs standing, runs/train_all/report.json)."""
    import json
    import subprocess
    import sys

    out = tmp_path / "report"
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
    })
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "build_all_configs.py"),
         "--train", "--stratified", "--out", str(out)],
        env=env, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    report = json.load(open(out / "report.json"))
    assert report["total"] == 9 and report["ok"] == 9, report["failures"]
    # every family produced a mode + (where it evaluates) sane metrics
    assert len(report["details"]) == 9
