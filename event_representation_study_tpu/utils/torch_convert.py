"""Reference-checkpoint import: torch state_dict -> Flax variables.

The reference publishes torch pickles of the ~400-module detector
(best_ckpt.pt, EMA half precision — engine.py:291-318); reproducing its
50.6 mAP without retraining requires importing them. This module maps the
reference's module names (conv_silu config graph) onto this framework's
parameter tree and applies the layout transforms (verified numerically
against torch):

- Conv2d weight OIHW -> HWIO
- ConvTranspose2d weight IOHW -> spatial flip + HWIO'  (flax ConvTranspose)
- Linear weight (out, in) -> (in, out)
- BatchNorm weight/bias -> scale/bias; running stats -> batch_stats

Name map (reference -> here):
  backbone.stem.block.*                  -> backbone/stem/*
  backbone.ERBlock_{k}.0.block.*         -> backbone/down_{k-1}/*
  backbone.ERBlock_{k}.1.<bepc3>         -> backbone/stage_{k-1}/<bepc3>
  backbone.ERBlock_6.2.sppf.*            -> backbone/sppf/*
  neck.reduce_layer{i}.block.*           -> neck/reduce_layer{i}/*
  neck.Bifusion{i}.cv{j}.block.*         -> neck/Bifusion{i}/cv{j}/*
  neck.Bifusion{i}.upsample.upsample_transpose -> neck/Bifusion{i}/upsample/upsample
  neck.Bifusion{i}.downsample.block.*    -> neck/Bifusion{i}/downsample/*
  neck.Rep_{x}.<bepc3>                   -> neck/Rep_{x}/<bepc3>
  neck.downsample{i}.block.*             -> neck/downsample{i}/*
  detect.stems.{i}.block.*               -> head/stem_{i}/*
  detect.cls_convs.{i}.block.*           -> head/cls_conv_{i}/*
  detect.reg_convs.{i}.block.*           -> head/reg_conv_{i}/*
  detect.cls_preds.{i}.*                 -> head/cls_pred_{i}/*
  detect.reg_preds.{i}.*                 -> head/reg_pred_{i}/*
  (detect.proj / proj_conv are constants here — skipped)
with <bepc3>: cv{j}.block.* -> cv{j}/*; m.conv1.conv{j}.block.* ->
m/conv1/conv{j}/*; m.conv1.alpha -> m/conv1/alpha;
m.block.{j}.conv{k}.block.* -> m/block_{j}/conv{k}/*.
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _rewrite_name(key: str) -> str:
    k = key
    k = re.sub(r"^module\.", "", k)
    k = re.sub(r"^backbone\.ERBlock_(\d+)\.0\.", lambda m: f"backbone.down_{int(m.group(1))-1}.", k)
    k = re.sub(r"^backbone\.ERBlock_(\d+)\.1\.", lambda m: f"backbone.stage_{int(m.group(1))-1}.", k)
    k = re.sub(r"^backbone\.ERBlock_\d+\.2\.sppf\.", "backbone.sppf.", k)
    # RepVGG branch conv/bn pairs: torch Sequential children -> flat names
    k = k.replace(".rbr_dense.conv.", ".rbr_dense_conv.")
    k = k.replace(".rbr_dense.bn.", ".rbr_dense_bn.")
    k = k.replace(".rbr_1x1.conv.", ".rbr_1x1_conv.")
    k = k.replace(".rbr_1x1.bn.", ".rbr_1x1_bn.")
    # RepBlock's sequential tail (block.0, block.1, ...) -> block_{i}
    k = re.sub(r"\.block\.(\d+)\.", lambda m: f".block_{m.group(1)}.", k)
    k = re.sub(r"^detect\.stems\.(\d+)\.", lambda m: f"head.stem_{m.group(1)}.", k)
    k = re.sub(r"^detect\.cls_convs\.(\d+)\.", lambda m: f"head.cls_conv_{m.group(1)}.", k)
    k = re.sub(r"^detect\.reg_convs\.(\d+)\.", lambda m: f"head.reg_conv_{m.group(1)}.", k)
    k = re.sub(r"^detect\.cls_preds\.(\d+)\.", lambda m: f"head.cls_pred_{m.group(1)}.", k)
    k = re.sub(r"^detect\.reg_preds\.(\d+)\.", lambda m: f"head.reg_pred_{m.group(1)}.", k)
    k = k.replace(".upsample.upsample_transpose.", ".upsample.upsample.")
    k = re.sub(r"\.m\.block\.(\d+)\.", lambda m: f".m.block_{m.group(1)}.", k)
    k = k.replace(".block.conv.", ".conv.").replace(".block.bn.", ".bn.")
    # torch Conv2d module (pred heads) keeps plain .weight/.bias
    return k


def _assign(tree: Dict, path, value):
    d = tree
    for p in path[:-1]:
        d = d.setdefault(p, {})
    d[path[-1]] = value


def convert_state_dict(torch_state: Dict[str, "np.ndarray"]) -> Tuple[Dict, Dict]:
    """torch name->tensor mapping -> (params, batch_stats) pytrees.

    Tensors may be torch tensors or numpy arrays. Unknown keys are returned
    under ``params['__unmatched__']`` for inspection rather than dropped
    silently.
    """
    params: Dict = {}
    batch_stats: Dict = {}
    unmatched = []
    for key, val in torch_state.items():
        if "num_batches_tracked" in key or "proj" in key:
            continue
        arr = np.asarray(getattr(val, "detach", lambda: val)()).astype(np.float32)
        name = _rewrite_name(key)
        parts = name.split(".")
        leaf = parts[-1]
        mod = parts[:-1]
        is_bn = len(mod) > 0 and (mod[-1] == "bn" or "rbr" in mod[-1] and "bn" in mod[-1] or mod[-1] == "rbr_identity")
        if is_bn or mod and mod[-1] == "bn1":
            if leaf == "weight":
                _assign(params, mod + ["scale"], arr)
            elif leaf == "bias":
                _assign(params, mod + ["bias"], arr)
            elif leaf == "running_mean":
                _assign(batch_stats, mod + ["mean"], arr)
            elif leaf == "running_var":
                _assign(batch_stats, mod + ["var"], arr)
            else:
                unmatched.append(key)
            continue
        if leaf == "weight":
            if arr.ndim == 4:
                if mod and mod[-1] == "upsample":
                    # ConvTranspose2d (I, O, kh, kw) -> flipped (kh, kw, I, O)
                    arr = arr[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()
                else:
                    arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
                _assign(params, mod + ["kernel"], arr)
            elif arr.ndim == 2:
                _assign(params, mod + ["kernel"], arr.T)
            else:
                unmatched.append(key)
        elif leaf == "bias":
            _assign(params, mod + ["bias"], arr)
        elif leaf == "alpha":
            _assign(params, mod + ["alpha"], arr.reshape(1))
        else:
            unmatched.append(key)
    if unmatched:
        params["__unmatched__"] = unmatched
    return params, batch_stats


def verify_against_tree(converted: Dict, reference_tree: Dict, prefix=""):
    """Shape-check a converted tree against a model's init tree; returns a
    list of (path, got, want) mismatches and missing paths."""
    problems = []

    def walk(c, r, path):
        for k, v in r.items():
            if k not in c:
                problems.append((path + "/" + k, None, "missing"))
            elif isinstance(v, dict):
                walk(c.get(k, {}), v, path + "/" + k)
            else:
                got = np.shape(c[k])
                want = np.shape(v)
                if got != want:
                    problems.append((path + "/" + k, got, want))

    walk(converted, reference_tree, prefix)
    return problems
