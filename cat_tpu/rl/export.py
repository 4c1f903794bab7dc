"""Policy export for deployment (replaces ONNX/TorchScript export,
reference clean_rl/play.py:118-138).

Artifacts:
  * ``policy_params.npz`` — pure-numpy parameter bundle (obs normalizer +
    MLP weights) with a documented layout, loadable anywhere.
  * ``policy.onnx`` — ONNX graph (obs_rms folded in, deterministic mean
    action, like the reference's Agent.forward export) via the
    torch.export-based ONNX exporter (the legacy TorchScript exporter is
    deprecated as of torch 2.9). Skipped gracefully if torch or the onnx
    toolchain is absent.
  * ``policy.pt2`` — ``torch.export`` program of the same module (the
    supported successor of TorchScript serialization).
  * ``policy.pt`` — TorchScript trace kept for drop-in parity with the
    reference's artifact (clean_rl/play.py:136-138 exports both formats).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _flatten_mlp(params: dict, net: str):
    """Extract [(W, b), ...] for actor/critic from flax params."""
    sub = params["params"][net]
    layers = []
    i = 0
    while f"Dense_{i}" in sub:
        layers.append(
            (np.asarray(sub[f"Dense_{i}"]["kernel"]),
             np.asarray(sub[f"Dense_{i}"]["bias"]))
        )
        i += 1
    return layers


def _flatten_actor(params: dict):
    """Actor path as [(W, b), ...] for either network layout: separate
    actor/critic (networks.ActorCritic) or the skrl-style shared trunk +
    policy_head (networks.SharedActorCritic)."""
    p = params["params"]
    if "actor" in p:
        return _flatten_mlp(params, "actor")
    layers = []
    i = 0
    while f"trunk_{i}" in p:
        layers.append(
            (np.asarray(p[f"trunk_{i}"]["kernel"]),
             np.asarray(p[f"trunk_{i}"]["bias"]))
        )
        i += 1
    layers.append(
        (np.asarray(p["policy_head"]["kernel"]),
         np.asarray(p["policy_head"]["bias"]))
    )
    return layers


def export_policy(ppo, ts, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    params = jax.device_get(ts.params)
    actor = _flatten_actor(params)
    bundle = {
        "obs_mean": np.asarray(ts.obs_rms.mean),
        "obs_var": np.asarray(ts.obs_rms.var),
        "log_std": np.asarray(params["params"]["log_std"]),
    }
    for i, (w, b) in enumerate(actor):
        bundle[f"actor_w{i}"] = w
        bundle[f"actor_b{i}"] = b
    np.savez(os.path.join(out_dir, "policy_params.npz"), **bundle)
    print(f"wrote {out_dir}/policy_params.npz")

    try:
        _export_torch(bundle, len(actor), out_dir)
    except Exception as e:  # torch optional
        print(f"TorchScript/ONNX export skipped: {e}")


def _export_torch(bundle: dict, n_layers: int, out_dir: str) -> None:
    import torch

    class Policy(torch.nn.Module):
        """obs -> normalized -> actor MLP mean (deterministic)."""

        def __init__(self):
            super().__init__()
            self.obs_mean = torch.nn.Parameter(
                torch.tensor(bundle["obs_mean"], dtype=torch.float32),
                requires_grad=False,
            )
            self.obs_var = torch.nn.Parameter(
                torch.tensor(bundle["obs_var"], dtype=torch.float32),
                requires_grad=False,
            )
            self.layers = torch.nn.ModuleList()
            for i in range(n_layers):
                w = bundle[f"actor_w{i}"]
                lin = torch.nn.Linear(w.shape[0], w.shape[1])
                lin.weight.data = torch.tensor(w.T, dtype=torch.float32)
                lin.bias.data = torch.tensor(
                    bundle[f"actor_b{i}"], dtype=torch.float32
                )
                self.layers.append(lin)

        def forward(self, obs):
            x = (obs - self.obs_mean) / torch.sqrt(self.obs_var + 1e-8)
            for i, lin in enumerate(self.layers):
                x = lin(x)
                if i < len(self.layers) - 1:
                    x = torch.nn.functional.elu(x)
            return x

    model = Policy().eval()
    dummy = torch.zeros(1, bundle["obs_mean"].shape[0])

    # torch.export program: the supported serialization path (batch dim
    # dynamic so deployment can run any env count)
    try:
        # batch>1 example input: size-1 dims specialize to constants
        dummy2 = torch.zeros(2, bundle["obs_mean"].shape[0])
        ep = torch.export.export(
            model, (dummy2,), dynamic_shapes=({0: torch.export.Dim.AUTO},)
        )
        pt2_path = os.path.join(out_dir, "policy.pt2")
        torch.export.save(ep, pt2_path)
        print(f"wrote {pt2_path}")
    except Exception as e:
        print(f"torch.export save skipped: {e}")

    # legacy-compat TorchScript artifact (the reference's .pt format)
    try:
        import warnings

        ts_path = os.path.join(out_dir, "policy.pt")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            traced = torch.jit.trace(model, dummy)
            traced.save(ts_path)
        print(f"wrote {ts_path}")
    except Exception as e:
        print(f"TorchScript export skipped: {e}")

    try:
        path = os.path.join(out_dir, "policy.onnx")
        # dynamo=True selects the torch.export-based ONNX exporter (the
        # TorchScript-based one is deprecated); needs the onnxscript
        # toolchain at runtime, absent here -> graceful skip.
        torch.onnx.export(
            model, (dummy,), path, input_names=["obs"],
            output_names=["action"], opset_version=18, dynamo=True,
        )
        print(f"wrote {path}")
    except Exception as e:  # the `onnx` pip package is not in this image
        print(f"ONNX export skipped: {e}")
