"""SCAN image-text retrieval (Stacked Cross Attention, Lee et al. 2018).

Reference: src/tools/captioning/scan.py + scan_utils.py (the retrieval model
the reference carries next to the captioner; maskrcnn-config-driven there).
Re-designed TPU-first:

- No per-caption Python loops: `xattn_score_*` computes the full
  (n_image, n_caption) similarity matrix as batched einsums with validity
  masks instead of length-sorted packing; `lax.map` chunks captions so the
  pairwise (img, cap, regions, words) tensor stays bounded.
- The GRU text encoder is a `lax.scan` with torch nn.GRU gate math
  (uni/bi-directional, masked tail zeroing = pack/pad semantics).
- Static shapes throughout; everything jits.

Math parity with the reference is locked by tests/test_scan.py (torch side
runs the actual reference scan_utils.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]
EPS = 1e-8


@dataclasses.dataclass(frozen=True)
class ScanConfig:
    img_dim: int = 2048          # precomputed region-feature dim
    vocab_size: int = 30522
    word_dim: int = 300
    embed_size: int = 1024
    num_layers: int = 1          # GRU layers; 0 = embedding only
    bi_gru: bool = True
    no_imgnorm: bool = False
    no_txtnorm: bool = False
    raw_feature_norm: str = "clipped_l2norm"
    lambda_softmax: float = 9.0
    lambda_lse: float = 6.0
    agg_func: str = "LogSumExp"  # LogSumExp | Max | Sum | Mean
    cross_attn: str = "t2i"      # t2i | i2t
    margin: float = 0.2
    max_violation: bool = True
    cap_chunk: int = 128         # captions per lax.map chunk in scoring


def l1norm(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    return x / (jnp.sum(jnp.abs(x), axis=axis, keepdims=True) + EPS)


def l2norm(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + EPS)


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------

def init_scan_params(rng: jax.Array, cfg: ScanConfig) -> Params:
    ks = jax.random.split(rng, 8)
    r = (6.0 / (cfg.img_dim + cfg.embed_size)) ** 0.5   # reference
    p: Params = {                                       # EncoderFeaturePrecomp
        "img_proj": {
            "kernel": jax.random.uniform(ks[0],
                                         (cfg.img_dim, cfg.embed_size),
                                         minval=-r, maxval=r),
            "bias": jnp.zeros((cfg.embed_size,)),
        },
        "embed": jax.random.uniform(ks[1], (cfg.vocab_size, cfg.word_dim),
                                    minval=-0.1, maxval=0.1),
    }
    if cfg.num_layers:
        def gru_layer(k, in_dim):
            k1, k2, k3, k4 = jax.random.split(k, 4)
            s = cfg.embed_size ** -0.5
            return {
                # torch GRU layout: W_ih (3H, in), W_hh (3H, H), gates r|z|n
                "w_ih": jax.random.uniform(k1, (3 * cfg.embed_size, in_dim),
                                           minval=-s, maxval=s),
                "w_hh": jax.random.uniform(
                    k2, (3 * cfg.embed_size, cfg.embed_size),
                    minval=-s, maxval=s),
                "b_ih": jax.random.uniform(k3, (3 * cfg.embed_size,),
                                           minval=-s, maxval=s),
                "b_hh": jax.random.uniform(k4, (3 * cfg.embed_size,),
                                           minval=-s, maxval=s),
            }
        dirs = 2 if cfg.bi_gru else 1
        p["gru"] = [[gru_layer(jax.random.fold_in(ks[2], li * 2 + d),
                               cfg.word_dim if li == 0
                               else cfg.embed_size * dirs)
                     for d in range(dirs)]
                    for li in range(cfg.num_layers)]
    return p


def _gru_direction(lp: Params, x: jnp.ndarray, lengths: jnp.ndarray,
                   reverse: bool) -> jnp.ndarray:
    """One GRU direction over (B, L, D); torch nn.GRU gate math.  The
    reverse direction starts at each sequence's last valid token
    (pack_padded_sequence semantics): positions >= length are skipped by
    carrying h through them."""
    B, L, D = x.shape
    H = lp["w_hh"].shape[1]
    w_ih = lp["w_ih"].T          # (D, 3H)
    w_hh = lp["w_hh"].T          # (H, 3H)

    ts = jnp.arange(L)
    if reverse:
        ts = ts[::-1]

    def step(h, t):
        xt = x[:, t]                                   # (B, D)
        valid = (t < lengths)[:, None]                 # (B, 1)
        gi = xt @ w_ih + lp["b_ih"]
        gh = h @ w_hh + lp["b_hh"]
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1 - z) * n + z * h
        h = jnp.where(valid, h_new, h)                 # skip padded steps
        return h, jnp.where(valid, h_new, 0.0)

    h0 = jnp.zeros((B, H), x.dtype)
    _, outs = jax.lax.scan(step, h0, ts)               # (L, B, H)
    outs = outs.transpose(1, 0, 2)
    if reverse:
        outs = outs[:, ::-1]
    return outs


def encode_text(params: Params, cap_ids: jnp.ndarray,
                lengths: jnp.ndarray, cfg: ScanConfig) -> jnp.ndarray:
    """(B, L) token ids -> (B, L, embed) (reference EncoderText.forward;
    bi-GRU directions are averaged)."""
    x = params["embed"][cap_ids]
    if cfg.num_layers:
        for layer in params["gru"]:
            fwd = _gru_direction(layer[0], x, lengths, reverse=False)
            if cfg.bi_gru:
                bwd = _gru_direction(layer[1], x, lengths, reverse=True)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
        if cfg.bi_gru:
            H = x.shape[-1] // 2
            x = (x[..., :H] + x[..., H:]) / 2
    else:
        x = jnp.where((jnp.arange(x.shape[1])[None, :]
                       < lengths[:, None])[..., None], x, 0.0)
    if not cfg.no_txtnorm:
        x = l2norm(x, -1)
    return x


def encode_image(params: Params, feats: jnp.ndarray,
                 cfg: ScanConfig) -> jnp.ndarray:
    """(B, R, img_dim) region features -> (B, R, embed)
    (reference EncoderFeaturePrecomp)."""
    x = feats @ params["img_proj"]["kernel"] + params["img_proj"]["bias"]
    if not cfg.no_imgnorm:
        x = l2norm(x, -1)
    return x


# ---------------------------------------------------------------------------
# stacked cross attention (reference func_attention scan_utils.py:236-292)
# ---------------------------------------------------------------------------

def func_attention(query: jnp.ndarray, context: jnp.ndarray,
                   cfg: ScanConfig, smooth: float,
                   q_valid: Optional[jnp.ndarray] = None,
                   c_valid: Optional[jnp.ndarray] = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """query (B, Lq, d), context (B, Ls, d) -> (weighted context (B, Lq, d),
    attn (B, Ls, Lq)).  Validity masks replace the reference's
    variable-length slicing."""
    attn = jnp.einsum("bsd,bqd->bsq", context, query)
    norm = cfg.raw_feature_norm
    if norm == "softmax":
        # reference reshapes to (B*sourceL, queryL) and softmaxes the last
        # axis — i.e. over queryL
        if q_valid is not None:
            attn = jnp.where(q_valid[:, None, :], attn, -1e30)
        attn = jax.nn.softmax(attn, axis=2)
    elif norm == "l2norm":
        attn = l2norm(attn, 2)
    elif norm == "clipped_l2norm":
        attn = l2norm(jax.nn.leaky_relu(attn, 0.1), 2)
    elif norm == "l1norm":
        attn = l1norm(attn, 2)
    elif norm == "clipped_l1norm":
        attn = l1norm(jax.nn.leaky_relu(attn, 0.1), 2)
    elif norm == "clipped":
        attn = jax.nn.leaky_relu(attn, 0.1)
    elif norm == "no_norm":
        pass
    else:
        raise ValueError(f"unknown raw_feature_norm {norm}")
    # softmax over sourceL with temperature
    a = attn.transpose(0, 2, 1) * smooth                 # (B, Lq, Ls)
    if c_valid is not None:
        a = jnp.where(c_valid[:, None, :], a, -1e30)
    a = jax.nn.softmax(a, axis=-1)
    weighted = jnp.einsum("bqs,bsd->bqd", a, context)
    return weighted, a.transpose(0, 2, 1)


def _cosine(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    w12 = jnp.sum(x1 * x2, -1)
    w1 = jnp.linalg.norm(x1, axis=-1)
    w2 = jnp.linalg.norm(x2, axis=-1)
    return w12 / jnp.maximum(w1 * w2, EPS)


def _aggregate(row_sim: jnp.ndarray, valid: Optional[jnp.ndarray],
               n_valid: jnp.ndarray, cfg: ScanConfig) -> jnp.ndarray:
    """row_sim (B, L) -> (B,) with the reference agg funcs; `valid` masks
    padded entries (reference slices them away / subtracts pad_size)."""
    if cfg.agg_func == "LogSumExp":
        e = jnp.exp(row_sim * cfg.lambda_lse)
        if valid is not None:
            e = jnp.where(valid, e, 0.0)
        return jnp.log(jnp.maximum(e.sum(-1), EPS)) / cfg.lambda_lse
    if cfg.agg_func == "Max":
        if valid is not None:
            row_sim = jnp.where(valid, row_sim, -jnp.inf)
        return row_sim.max(-1)
    if cfg.agg_func == "Sum":
        if valid is not None:
            row_sim = jnp.where(valid, row_sim, 0.0)
        return row_sim.sum(-1)
    if cfg.agg_func == "Mean":
        if valid is not None:
            row_sim = jnp.where(valid, row_sim, 0.0)
        return row_sim.sum(-1) / n_valid
    raise ValueError(f"unknown agg_func {cfg.agg_func}")


def xattn_score_t2i(img_emb: jnp.ndarray, cap_emb: jnp.ndarray,
                    cap_lens: jnp.ndarray, cfg: ScanConfig) -> jnp.ndarray:
    """(n_img, R, d), (n_cap, Lw, d), (n_cap,) -> scores (n_img, n_cap).
    Each caption's words attend every image's regions."""
    n_img = img_emb.shape[0]
    Lw = cap_emb.shape[1]

    def one_cap(args):
        cap, ln = args                                  # (Lw, d), ()
        capx = jnp.broadcast_to(cap[None], (n_img, Lw, cap.shape[-1]))
        q_valid = jnp.broadcast_to((jnp.arange(Lw) < ln)[None],
                                   (n_img, Lw))
        wctx, _ = func_attention(capx, img_emb, cfg,
                                 smooth=cfg.lambda_softmax, q_valid=q_valid)
        row = _cosine(capx, wctx)                       # (n_img, Lw)
        return _aggregate(row, q_valid, ln.astype(row.dtype), cfg)

    sims = jax.lax.map(one_cap, (cap_emb, cap_lens),
                       batch_size=min(cfg.cap_chunk, cap_emb.shape[0]))
    return sims.T                                       # (n_img, n_cap)


def xattn_score_i2t(img_emb: jnp.ndarray, img_lens: jnp.ndarray,
                    cap_emb: jnp.ndarray, cap_lens: jnp.ndarray,
                    cfg: ScanConfig) -> jnp.ndarray:
    """(n_img, R, d), (n_img,), (n_cap, Lw, d), (n_cap,) ->
    (n_img, n_cap).  Image regions attend each caption's words."""
    n_img, R, _ = img_emb.shape

    def one_cap(args):
        cap, ln = args
        capx = jnp.broadcast_to(cap[None], (n_img,) + cap.shape)
        c_valid = jnp.broadcast_to((jnp.arange(cap.shape[0]) < ln)[None],
                                   (n_img, cap.shape[0]))
        wctx, _ = func_attention(img_emb, capx, cfg,
                                 smooth=cfg.lambda_softmax, c_valid=c_valid)
        row = _cosine(img_emb, wctx)                    # (n_img, R)
        r_valid = jnp.arange(R)[None] < img_lens[:, None]
        return _aggregate(row, r_valid, img_lens.astype(row.dtype), cfg)

    sims = jax.lax.map(one_cap, (cap_emb, cap_lens),
                       batch_size=min(cfg.cap_chunk, cap_emb.shape[0]))
    return sims.T


def scan_scores(img_emb, img_lens, cap_emb, cap_lens, cfg: ScanConfig):
    if cfg.cross_attn == "t2i":
        return xattn_score_t2i(img_emb, cap_emb, cap_lens, cfg)
    if cfg.cross_attn == "i2t":
        return xattn_score_i2t(img_emb, img_lens, cap_emb, cap_lens, cfg)
    raise ValueError(f"unknown cross_attn {cfg.cross_attn}")


# ---------------------------------------------------------------------------
# loss + retrieval metrics
# ---------------------------------------------------------------------------

def contrastive_loss(scores: jnp.ndarray, cfg: ScanConfig) -> jnp.ndarray:
    """Bidirectional hinge over the (B, B) in-batch score matrix
    (reference ContrastiveLoss scan_utils.py:455-498)."""
    B = scores.shape[0]
    diag = jnp.diagonal(scores)
    cost_s = jnp.maximum(cfg.margin + scores - diag[:, None], 0.0)
    cost_im = jnp.maximum(cfg.margin + scores - diag[None, :], 0.0)
    eye = jnp.eye(B, dtype=bool)
    cost_s = jnp.where(eye, 0.0, cost_s)
    cost_im = jnp.where(eye, 0.0, cost_im)
    if cfg.max_violation:
        cost_s = cost_s.max(axis=1)
        cost_im = cost_im.max(axis=0)
    return cost_s.sum() + cost_im.sum()


def scan_forward(params: Params, img_feats: jnp.ndarray,
                 img_lens: jnp.ndarray, cap_ids: jnp.ndarray,
                 cap_lens: jnp.ndarray, cfg: ScanConfig,
                 train: bool = True):
    """Training: contrastive loss over the in-batch score matrix.
    Eval: (img_emb, cap_emb) for corpus-level retrieval
    (reference SCAN.forward scan.py:75-287)."""
    img_emb = encode_image(params, img_feats, cfg)
    cap_emb = encode_text(params, cap_ids, cap_lens, cfg)
    if not train:
        return img_emb, cap_emb
    scores = scan_scores(img_emb, img_lens, cap_emb, cap_lens, cfg)
    return contrastive_loss(scores, cfg)


def retrieval_metrics(scores: jnp.ndarray, caps_per_image: int = 5
                      ) -> Dict[str, float]:
    """i2t / t2i R@{1,5,10} + median rank.  scores (n_img, n_cap), caption
    j belongs to image j // caps_per_image."""
    import numpy as np
    s = np.asarray(scores)
    n_img, n_cap = s.shape
    # image -> text
    ranks = []
    for i in range(n_img):
        order = np.argsort(-s[i])
        gold = set(range(i * caps_per_image, (i + 1) * caps_per_image))
        ranks.append(min(np.where(np.isin(order, list(gold)))[0]))
    ranks = np.array(ranks)
    out = {f"i2t_R@{k}": float((ranks < k).mean() * 100) for k in (1, 5, 10)}
    out["i2t_medr"] = float(np.median(ranks) + 1)
    # text -> image
    tranks = []
    for j in range(n_cap):
        order = np.argsort(-s[:, j])
        tranks.append(int(np.where(order == j // caps_per_image)[0][0]))
    tranks = np.array(tranks)
    out.update({f"t2i_R@{k}": float((tranks < k).mean() * 100)
                for k in (1, 5, 10)})
    out["t2i_medr"] = float(np.median(tranks) + 1)
    return out
