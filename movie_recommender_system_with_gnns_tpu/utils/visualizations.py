"""Visualization suite: training-history plots, recommendation charts, embedding
analysis, and user-item similarity graphs.

Capability parity with reference ``utils/visualizations.py`` (315 LoC of
Plotly/UMAP/networkx — :255-294 plot_histories, :296-316 plot_recommendations,
:93-227 analyze_user_recommendations, :21-91 create/plot_user_item_graph),
re-implemented on matplotlib (this image has no plotly) with sklearn TSNE/PCA
standing in for UMAP (not installed) when unavailable. All functions save to
file (headless Agg backend) and return the figure.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

try:
    from umap import UMAP  # type: ignore

    _HAVE_UMAP = True
except ImportError:
    _HAVE_UMAP = False

try:
    import networkx as nx

    _HAVE_NX = True
except ImportError:
    _HAVE_NX = False


def _embed_2d(x: np.ndarray, n_neighbors: int = 15, min_dist: float = 0.1,
              seed: int = 42) -> np.ndarray:
    """2-D projection: UMAP when installed (reference visualizations.py:150-151
    params), else sklearn TSNE, else PCA."""
    if _HAVE_UMAP:
        return UMAP(n_neighbors=n_neighbors, min_dist=min_dist,
                    random_state=seed).fit_transform(x)
    try:
        from sklearn.manifold import TSNE

        perp = min(30.0, max(5.0, x.shape[0] / 4.0))
        return TSNE(n_components=2, random_state=seed, perplexity=perp,
                    init="pca").fit_transform(x)
    except ImportError:
        xc = x - x.mean(axis=0)
        _, _, vt = np.linalg.svd(xc, full_matrices=False)
        return xc @ vt[:2].T


def plot_histories(histories_dir: str = "data/histories",
                   out_path: Optional[str] = None):
    """Train/val loss + val recall curves with best-epoch annotation
    (reference plot_histories, visualizations.py:255-294)."""
    tl = np.load(os.path.join(histories_dir, "hist_train_loss.npy"))
    vl = np.load(os.path.join(histories_dir, "hist_val_loss.npy"))
    vr = np.load(os.path.join(histories_dir, "hist_val_recall.npy"))
    best = int(np.argmax(vr))  # visualizations.py:272

    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(9, 7), sharex=True)
    epochs = np.arange(len(tl))
    ax1.plot(epochs, tl, label="train loss", color="tab:blue")
    ax1.plot(epochs, vl, label="val loss", color="tab:orange")
    ax1.set_ylabel("BPR loss")
    ax1.legend()
    ax1.set_title("Training histories")
    ax2.plot(epochs, vr, label="val recall@k", color="tab:green")
    ax2.scatter([best], [vr[best]], color="red", zorder=5)
    ax2.annotate(f"best epoch {best}\nrecall {vr[best]:.3e}",
                 (best, vr[best]), textcoords="offset points", xytext=(10, -15))
    ax2.set_xlabel("epoch")
    ax2.set_ylabel("recall@k")
    ax2.legend()
    fig.tight_layout()
    if out_path is None:
        out_path = os.path.join(histories_dir, "histories_training.png")
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_recommendations(recommendations: List[Dict[str, Any]], user_id: int,
                         out_path: str = "recommendations.png"):
    """Horizontal bar chart of top-k titles vs scores (reference
    plot_recommendations, visualizations.py:296-316)."""
    titles = [r["title"] for r in recommendations][::-1]
    scores = [r["score"] for r in recommendations][::-1]
    fig, ax = plt.subplots(figsize=(9, 0.5 * len(titles) + 2))
    ax.barh(range(len(titles)), scores, color="tab:blue")
    ax.set_yticks(range(len(titles)))
    ax.set_yticklabels([t[:50] for t in titles], fontsize=8)
    ax.set_xlabel("score")
    ax.set_title(f"Top {len(titles)} recommendations for user {user_id}")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def analyze_user_recommendations(
    params,
    user_id: int,
    data,
    n_neighbors: int = 15,
    min_dist: float = 0.1,
    out_path: str = "user_analysis.png",
    num_similar_users: int = 25,
    num_top_movies: int = 50,
):
    """2-D embedding-space analysis of a user (reference
    analyze_user_recommendations, visualizations.py:93-227): top-25 most
    similar users, bottom-25 least similar, top-50 movies by score, projected
    together with the main user and scatter-plotted by type."""
    uidx = int(data.user_index(user_id))
    if uidx < 0:
        raise ValueError(f"Invalid user ID {user_id}")
    u = np.asarray(params.user_emb)
    it = np.asarray(params.item_emb)
    un = u / np.linalg.norm(u, axis=1, keepdims=True)
    itn = it / np.linalg.norm(it, axis=1, keepdims=True)

    me = un[uidx]
    user_sims = un @ me
    user_sims[uidx] = -np.inf
    similar = np.argsort(-user_sims)[:num_similar_users]
    dissimilar = np.argsort(user_sims)[:num_similar_users]
    movie_scores = itn @ me
    top_movies = np.argsort(-movie_scores)[:num_top_movies]

    stack = np.concatenate([
        u[uidx][None], u[similar], u[dissimilar], it[top_movies]
    ])
    xy = _embed_2d(stack, n_neighbors=n_neighbors, min_dist=min_dist)

    fig, ax = plt.subplots(figsize=(9, 7))
    s = 1 + num_similar_users
    d = s + num_similar_users
    ax.scatter(*xy[1:s].T, c="tab:green", marker="o", label="similar users", alpha=0.7)
    ax.scatter(*xy[s:d].T, c="tab:red", marker="o", label="dissimilar users", alpha=0.7)
    ax.scatter(*xy[d:].T, c="tab:blue", marker="^", label="recommended movies", alpha=0.7)
    ax.scatter(*xy[0].T, c="black", marker="*", s=250, label=f"user {user_id}")
    ax.legend()
    ax.set_title(f"Embedding-space neighborhood of user {user_id} "
                 f"({'UMAP' if _HAVE_UMAP else 'TSNE/PCA'})")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def create_user_item_graph(user_embedding: np.ndarray, item_embedding: np.ndarray,
                           num_users: int = 100, num_items: int = 100,
                           top_k: int = 5):
    """Bipartite similarity graph: each of the first ``num_users`` users links to
    its top-5 scored items (reference create_user_item_graph,
    visualizations.py:21-38)."""
    if not _HAVE_NX:
        raise RuntimeError("networkx is not available")
    g = nx.Graph()
    u = np.asarray(user_embedding)[:num_users]
    it = np.asarray(item_embedding)[:num_items]
    for i in range(u.shape[0]):
        g.add_node(f"U{i}", bipartite=0)
    for i in range(it.shape[0]):
        g.add_node(f"I{i}", bipartite=1)
    sims = u @ it.T
    top = np.argsort(-sims, axis=1)[:, :top_k]
    for i in range(u.shape[0]):
        for j in top[i]:
            g.add_edge(f"U{i}", f"I{int(j)}")
    return g


def plot_user_item_graph(g, out_path: str = "user_item_graph.png"):
    """Spring-layout render (reference plot_user_item_graph,
    visualizations.py:40-91)."""
    if not _HAVE_NX:
        raise RuntimeError("networkx is not available")
    pos = nx.spring_layout(g, seed=42)
    fig, ax = plt.subplots(figsize=(9, 9))
    colors = ["tab:blue" if n.startswith("U") else "tab:orange" for n in g.nodes()]
    nx.draw_networkx_edges(g, pos, ax=ax, width=0.5, edge_color="#888888")
    nx.draw_networkx_nodes(g, pos, ax=ax, node_size=30, node_color=colors)
    ax.set_title("User-Item Interaction Graph")
    ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
