"""Training entry point (counterpart of scoreperformer/train.py:9-32).

Usage: python train.py -r recipes -n scoreperformer/base.yaml
"""
import argparse


def main():
    parser = argparse.ArgumentParser(description="Train a ScorePerformer-TPU model")
    parser.add_argument("-r", "--root", type=str, default="recipes", help="config root dir")
    parser.add_argument("-n", "--name", type=str, required=True, help="config name (yaml)")
    parser.add_argument("--eval-only", action="store_true")
    args = parser.parse_args()

    import os

    import jax

    # sitecustomize force-registers the axon TPU platform; honor an explicit
    # JAX_PLATFORMS=cpu the same way tests/conftest.py does so CPU training
    # works without a TPU attached
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    # persistent compile cache (crucial on remote-compile TPU platforms);
    # host-keyed so cross-host XLA:CPU AOT entries can't segfault on load
    from scoreperformer_tpu.utils import enable_compile_cache

    enable_compile_cache()

    from scoreperformer_tpu.training import ExperimentComponents

    components = ExperimentComponents.from_yaml(args.root, args.name)

    # multi-host hook: jax.distributed.initialize() must run before any jax
    # op touches the backend (SURVEY §2.8); the Trainer would be too late.
    tr_cfg = components.config.get("trainer") or {}
    if tr_cfg.get("multihost"):
        from types import SimpleNamespace

        from scoreperformer_tpu.parallel import maybe_distributed_initialize

        maybe_distributed_initialize(SimpleNamespace(
            coordinator_address=tr_cfg.get("coordinator_address"),
            num_processes=tr_cfg.get("num_processes"),
            process_id=tr_cfg.get("process_id"),
        ))

    components.init_components()

    if args.eval_only:
        metrics = components.trainer.evaluate()
        print(metrics)
    else:
        components.trainer.train()


if __name__ == "__main__":
    main()
