"""Genotype extraction and entropy regularization — host-side numpy.

Re-implements the parse machinery of reference
``models/model_search_interact.py``:
- ``btw`` (:1054-1065): per-step softmax over growing beta groups;
- ``_parse3`` (:961-994): greedy top-probability edge selection until
  cumulative prob >= 0.7 or 4 edges, over beta-scaled alpha softmaxes;
- ``_parse_popa`` (:996-1016): classic DARTS top-2-edges-per-step parse
  for the fusion cells;
- ``genotype`` (:913-1051): assembling GenotypeInter + GenotypeFuse;
- ``loss_entropy`` (:881-896): mean normalized categorical entropy of the
  alpha softmaxes (differentiable jnp version for the arch step).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from npp_tpu import genotypes as gt


def np_softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    e = np.exp(x - np.max(x, axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def btw_np(betas: np.ndarray, n_input: int, steps: int) -> np.ndarray:
    out = []
    start, n = 0, n_input
    for _ in range(steps):
        out.append(np_softmax(betas[start:start + n]))
        start += n
        n += 1
    return np.concatenate(out, axis=0)


def parse_topp(alpha_w: np.ndarray, beta_w: np.ndarray, n_input: int,
               steps: int, primitives=gt.PRIMITIVES_INTER,
               prob_threshold: float = 0.7, max_edges: int = 4):
    """_parse3: per step, greedily take the largest (edge, op) weights
    until their sum reaches the threshold or max_edges edges."""
    gene, weight_lists = [], []
    start, n = 0, n_input
    for _ in range(steps):
        w = alpha_w[start:start + n].copy()
        w = w * beta_w[start:start + n, None]
        prob = 0.0
        edges, picked = [], []
        while prob < prob_threshold and len(edges) < max_edges:
            m = np.max(w)
            prob += m
            j, k = np.unravel_index(np.argmax(w), w.shape)
            w[j, k] = 0
            picked.append(m)
            edges.append((primitives[k], int(j)))
        gene.append(edges)
        weight_lists.append(np.asarray(picked) / np.sum(picked))
        start += n
        n += 1
    return gene, weight_lists


def parse_popa(alpha_w: np.ndarray, beta_w: np.ndarray, steps: int = 4,
               n_input: int = 3, primitives=gt.PRIMITIVES_INTER):
    """_parse_popa: top-2 edges per step (ranked by each edge's best op
    weight), best op per chosen edge."""
    gene = []
    start, n = 0, n_input
    for i in range(steps):
        w = alpha_w[start:start + n].copy()
        w = w * beta_w[start:start + n, None]
        edges = sorted(range(n), key=lambda x: -np.max(w[x]))[:2]
        for j in edges:
            k_best = int(np.argmax(w[j]))
            gene.append((primitives[k_best], int(j)))
        start += n
        n += 1
    return gene


def extract_genotype(arch_params: dict):
    """Builds (GenotypeInter, GenotypeFuse) from the supernet's arch params
    (model_search_interact.py:913-1051). ``arch_params`` maps the param
    names (alphas1, betas1, ...) to numpy arrays."""
    a = {k: np.asarray(v, np.float64) for k, v in arch_params.items()}

    g1, _ = parse_topp(np_softmax(a["alphas1"]), btw_np(a["betas1"], 1, 4),
                       n_input=1, steps=4)
    g2, _ = parse_topp(np_softmax(a["alphas2"]), btw_np(a["betas2"], 1, 4),
                       n_input=1, steps=4)
    g3, _ = parse_topp(np_softmax(a["alphas3"]), btw_np(a["betas3"], 5, 3),
                       n_input=5, steps=3)
    g4, _ = parse_topp(np_softmax(a["alphas4"]), btw_np(a["betas4"], 5, 3),
                       n_input=5, steps=3)
    genotype_inter = gt.GenotypeInter(
        task1=tuple(tuple(g) for g in g1),
        task2=tuple(tuple(g) for g in g2),
        task3=tuple(tuple(g) for g in g3),
        task4=tuple(tuple(g) for g in g4),
    )

    gp = parse_popa(np_softmax(a["alphas_pose"]),
                    btw_np(a["betas_pose"], 3, 4))
    gr = parse_popa(np_softmax(a["alphas_par"]), btw_np(a["betas_par"], 3, 4))
    genotype_fuse = gt.GenotypeFuse(
        pose=tuple(gp), pose_concat=tuple(range(3, 7)),
        par=tuple(gr), par_concat=tuple(range(3, 7)),
    )
    return genotype_inter, genotype_fuse


def loss_entropy(arch_params: dict) -> jnp.ndarray:
    """Differentiable entropy regularizer (model_search_interact.py:881-896):
    0.25 * 2 / n_params * sum of mean normalized alpha entropies."""
    import jax

    alphas = [arch_params[k] for k in
              ("alphas1", "alphas2", "alphas3", "alphas4", "alphas_pose",
               "alphas_par")]
    length = 12  # 6 alphas + 6 betas in the reference's param list
    en = 0.0
    for al in alphas:
        p = jax.nn.softmax(al, axis=-1)
        ent = -jnp.sum(p * jnp.log(jnp.clip(p, 1e-12)), axis=-1)
        en = en + jnp.mean(ent / math.log(al.shape[1]))
    return 0.25 * 2 * en / length
