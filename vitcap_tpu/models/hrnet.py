"""HRNet (the reference zoo's hrnet.py:61-831 — classification heads).

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op:

- stem: two 3x3/2 conv+bn+relu; layer1 = ResNet bottleneck chain.
- stages 2-4: per-module parallel branches of basic blocks followed by
  the full fuse mesh (j > i: 1x1 conv+bn + nearest 2^(j-i) upsample;
  j < i: chain of stride-2 3x3 conv+bn(+relu except last)), summed and
  relu'd (hrnet.py:388-505).
- transitions between stages: 3x3 conv+bn+relu on changed channels and
  stride-2 chains for the new lowest branch, fed from the PREVIOUS
  stage's last branch (:613-638).
- classification head: per-branch bottleneck incre modules, biased 3x3/2
  downsample convs accumulating toward the lowest resolution, 1x1 final
  conv to 2048 (:575-611, :704-722).

Config table extracted from the reference cfg_cls (:61-386).
Torch state-dict loader mirrors the module paths.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import _batch_norm, _bn_p, _bn_from, _kaiming, _v, _w

Params = Dict[str, Any]

# name -> (s1_blocks, s1_chs, (modules s2, s3, s4), branch_blocks, widths)
HRNETS = {
    "hrnet_w18_small": (1, 32, (1, 1, 1), 2, (16, 32, 64, 128)),
    "hrnet_w18_small_v2": (2, 64, (1, 3, 2), 2, (18, 36, 72, 144)),
    "hrnet_w18": (4, 64, (1, 4, 3), 4, (18, 36, 72, 144)),
    "hrnet_w30": (4, 64, (1, 4, 3), 4, (30, 60, 120, 240)),
    "hrnet_w32": (4, 64, (1, 4, 3), 4, (32, 64, 128, 256)),
    "hrnet_w40": (4, 64, (1, 4, 3), 4, (40, 80, 160, 320)),
    "hrnet_w44": (4, 64, (1, 4, 3), 4, (44, 88, 176, 352)),
    "hrnet_w48": (4, 64, (1, 4, 3), 4, (48, 96, 192, 384)),
    "hrnet_w64": (4, 64, (1, 4, 3), 4, (64, 128, 256, 512)),
}
HRNET_FEATURES = 2048
_HEAD_CHS = (32, 64, 128, 256)


def _conv3(x, w, stride=1):
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv1(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _cbr(x, p, stride=1, act=True, k3=True):
    y = (_conv3 if k3 else _conv1)(x, p["conv"], stride)
    if "cb" in p:
        y = y + p["cb"]
    y = _batch_norm(y, p["bn"], act=False)
    return jax.nn.relu(y) if act else y


def _basic(x, bp):
    relu = jax.nn.relu
    residual = x
    if "down" in bp:
        residual = _cbr(x, bp["down"], act=False, k3=False)
    y = relu(_batch_norm(_conv3(x, bp["conv1"]), bp["bn1"], act=False))
    y = _batch_norm(_conv3(y, bp["conv2"]), bp["bn2"], act=False)
    return relu(y + residual)


def _bottleneck(x, bp):
    relu = jax.nn.relu
    residual = x
    if "down" in bp:
        residual = _cbr(x, bp["down"], act=False, k3=False)
    y = relu(_batch_norm(_conv1(x, bp["conv1"]), bp["bn1"], act=False))
    y = relu(_batch_norm(_conv3(y, bp["conv2"]), bp["bn2"], act=False))
    y = _batch_norm(_conv1(y, bp["conv3"]), bp["bn3"], act=False)
    return relu(y + residual)


def _upsample_nearest(x, factor):
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


def _module_apply(mp, xs):
    """HighResolutionModule forward (hrnet.py:481-505)."""
    xs = [x for x in xs]
    for i, branch in enumerate(mp["branches"]):
        for bp in branch:
            xs[i] = _basic(xs[i], bp)
    nb = len(xs)
    outs = []
    for i, fuse in enumerate(mp["fuse"]):
        y = xs[0] if i == 0 else _fuse_path(fuse[0], xs[0], 0, i)
        for j in range(1, nb):
            y = y + (xs[j] if j == i else _fuse_path(fuse[j], xs[j], j, i))
        outs.append(jax.nn.relu(y))
    return outs


def _fuse_path(fp, x, j, i):
    if j > i:                      # 1x1 conv+bn then nearest upsample
        y = _cbr(x, fp, act=False, k3=False)
        return _upsample_nearest(y, 2 ** (j - i))
    # j < i: chain of stride-2 3x3 conv+bn (+relu except last)
    for k, cp in enumerate(fp):
        y = _cbr(x if k == 0 else y, cp, stride=2,
                 act=(k != len(fp) - 1))
    return y


def apply_hrnet(p: Params, images: jnp.ndarray, variant: str) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/32, W/32, 2048) post-final-layer features."""
    s1b, s1c, modules, bb, widths = HRNETS[variant]
    x = _cbr(images, p["stem1"], 2)
    x = _cbr(x, p["stem2"], 2)
    for bp in p["layer1"]:
        x = _bottleneck(x, bp)
    ys = [x]
    for si, n_mod in enumerate(modules):
        nb = si + 2
        trans = p[f"transition{si + 1}"]
        xs = []
        for i in range(nb):
            t = trans[i]
            if t is None:
                xs.append(ys[i])
            elif isinstance(t, dict):
                # channel-change conv on the matching branch
                xs.append(_cbr(ys[i], t))
            else:
                # new lowest branch: stride-2 chain from the LAST branch
                y = ys[-1]
                for cp in t:
                    y = _cbr(y, cp, stride=2)
                xs.append(y)
        for mp in p[f"stage{si + 2}"]:
            xs = _module_apply(mp, xs)
        ys = xs
    # classification head
    y = None
    for i, yl in enumerate(ys):
        h = _bottleneck(yl, p["incre"][i])
        y = h if i == 0 else h + _cbr(y, p["downsamp"][i - 1], stride=2)
    return _cbr(y, p["final"], k3=False)


def _bn_init(c):
    return _bn_p(c)


def init_hrnet(rng: jax.Array, variant: str) -> Params:
    s1b, s1c, modules, bb, widths = HRNETS[variant]
    ks = iter(jax.random.split(rng, 2048))

    def cbr_p(cin, cout, k=3, bias=False):
        p = {"conv": _kaiming(next(ks), (k, k, cin, cout)),
             "bn": _bn_init(cout)}
        if bias:
            p["cb"] = jnp.zeros((cout,), jnp.float32)
        return p

    def basic_p(cin, planes):
        bp = {"conv1": _kaiming(next(ks), (3, 3, cin, planes)),
              "bn1": _bn_init(planes),
              "conv2": _kaiming(next(ks), (3, 3, planes, planes)),
              "bn2": _bn_init(planes)}
        if cin != planes:
            bp["down"] = cbr_p(cin, planes, 1)
        return bp

    def bottleneck_p(cin, planes):
        out = planes * 4
        bp = {"conv1": _kaiming(next(ks), (1, 1, cin, planes)),
              "bn1": _bn_init(planes),
              "conv2": _kaiming(next(ks), (3, 3, planes, planes)),
              "bn2": _bn_init(planes),
              "conv3": _kaiming(next(ks), (1, 1, planes, out)),
              "bn3": _bn_init(out)}
        if cin != out:
            bp["down"] = cbr_p(cin, out, 1)
        return bp

    p: Params = {"stem1": cbr_p(3, 64), "stem2": cbr_p(64, 64),
                 "layer1": []}
    cin = 64
    for b in range(s1b):
        p["layer1"].append(bottleneck_p(cin, s1c))
        cin = s1c * 4
    prev_chs = [s1c * 4]
    for si, n_mod in enumerate(modules):
        nb = si + 2
        cur = list(widths[:nb])
        trans = []
        for i in range(nb):
            if i < len(prev_chs):
                trans.append(cbr_p(prev_chs[i], cur[i])
                             if prev_chs[i] != cur[i] else None)
            else:
                chain = []
                for j in range(i + 1 - len(prev_chs)):
                    cin_t = prev_chs[-1]
                    cout_t = cur[i] if j == i - len(prev_chs) else cin_t
                    chain.append(cbr_p(cin_t, cout_t))
                trans.append(chain)
        p[f"transition{si + 1}"] = trans
        mods = []
        for _ in range(n_mod):
            branches = []
            for i in range(nb):
                blks = []
                c = cur[i]
                for _b in range(bb):
                    blks.append(basic_p(c, cur[i]))
                branches.append(blks)
            fuse = []
            for i in range(nb):
                row = []
                for j in range(nb):
                    if j > i:
                        row.append(cbr_p(cur[j], cur[i], 1))
                    elif j == i:
                        row.append(None)
                    else:
                        chain = []
                        for k in range(i - j):
                            cout_f = cur[i] if k == i - j - 1 else cur[j]
                            chain.append(cbr_p(cur[j], cout_f))
                        row.append(chain)
                fuse.append(row)
            mods.append({"branches": branches, "fuse": fuse})
        p[f"stage{si + 2}"] = mods
        prev_chs = cur
    p["incre"] = [bottleneck_p(prev_chs[i], _HEAD_CHS[i])
                  for i in range(4)]
    p["downsamp"] = [cbr_p(_HEAD_CHS[i] * 4, _HEAD_CHS[i + 1] * 4,
                           bias=True) for i in range(3)]
    p["final"] = cbr_p(_HEAD_CHS[3] * 4, HRNET_FEATURES, 1, bias=True)
    return p


def load_hrnet(params: Params, sd: Dict[str, Any], variant: str,
               prefix: str = "") -> Params:
    """Load the reference timm HighResolutionNet torch state-dict."""
    def cbr_from(cbase, bbase, bias=False):
        p = {"conv": _w(sd, cbase + ".weight"),
             "bn": _bn_from(sd, bbase)}
        if bias:
            p["cb"] = _v(sd, cbase + ".bias")
        return p

    def seq_cbr_from(base, bias=False):
        return cbr_from(base + ".0", base + ".1", bias)

    def basic_from(base, blk):
        bp = {"conv1": _w(sd, base + ".conv1.weight"),
              "bn1": _bn_from(sd, base + ".bn1"),
              "conv2": _w(sd, base + ".conv2.weight"),
              "bn2": _bn_from(sd, base + ".bn2")}
        if "down" in blk:
            bp["down"] = seq_cbr_from(base + ".downsample")
        return bp

    def bott_from(base, blk):
        bp = {"conv1": _w(sd, base + ".conv1.weight"),
              "bn1": _bn_from(sd, base + ".bn1"),
              "conv2": _w(sd, base + ".conv2.weight"),
              "bn2": _bn_from(sd, base + ".bn2"),
              "conv3": _w(sd, base + ".conv3.weight"),
              "bn3": _bn_from(sd, base + ".bn3")}
        if "down" in blk:
            bp["down"] = seq_cbr_from(base + ".downsample")
        return bp

    p: Params = {
        "stem1": cbr_from(prefix + "conv1", prefix + "bn1"),
        "stem2": cbr_from(prefix + "conv2", prefix + "bn2"),
        "layer1": [bott_from(f"{prefix}layer1.{i}", blk)
                   for i, blk in enumerate(params["layer1"])],
    }
    for ti in (1, 2, 3):
        trans = []
        for i, t in enumerate(params[f"transition{ti}"]):
            base = f"{prefix}transition{ti}.{i}"
            if t is None:
                trans.append(None)
            elif isinstance(t, dict):
                trans.append(seq_cbr_from(base))
            else:
                trans.append([seq_cbr_from(f"{base}.{j}")
                              for j in range(len(t))])
        p[f"transition{ti}"] = trans
    for si in (2, 3, 4):
        mods = []
        for mi, mp in enumerate(params[f"stage{si}"]):
            base = f"{prefix}stage{si}.{mi}"
            branches = []
            for bi, blks in enumerate(mp["branches"]):
                branches.append([basic_from(f"{base}.branches.{bi}.{li}",
                                            blk)
                                 for li, blk in enumerate(blks)])
            fuse = []
            for i, row in enumerate(mp["fuse"]):
                nrow = []
                for j, f in enumerate(row):
                    fb = f"{base}.fuse_layers.{i}.{j}"
                    if f is None:
                        nrow.append(None)
                    elif isinstance(f, dict):
                        nrow.append(seq_cbr_from(fb))
                    else:
                        nrow.append([seq_cbr_from(f"{fb}.{k}")
                                     for k in range(len(f))])
                fuse.append(nrow)
            mods.append({"branches": branches, "fuse": fuse})
        p[f"stage{si}"] = mods
    p["incre"] = [bott_from(f"{prefix}incre_modules.{i}.0", blk)
                  for i, blk in enumerate(params["incre"])]
    p["downsamp"] = [seq_cbr_from(f"{prefix}downsamp_modules.{i}",
                                  bias=True) for i in range(3)]
    p["final"] = seq_cbr_from(prefix + "final_layer", bias=True)
    return p
