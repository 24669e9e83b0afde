"""Plotting API (reference python-package/xgboost/plotting.py:21-370
plot_importance / to_graphviz / plot_tree).

matplotlib / graphviz are optional and absent from the minimal runtime
image, so each entry point degrades explicitly:

- ``to_graphviz`` builds the DOT source with the engine's own
  ``GBDTModel.get_dot`` (no external dependency) and wraps it in
  ``graphviz.Source`` only when graphviz is importable; otherwise it
  returns the DOT string itself.
- ``plot_importance`` / ``plot_tree`` need matplotlib to draw; they
  raise ImportError with a clear message when it is missing.  The data
  preparation halves (`importance_series`, DOT build) are dependency-free
  and unit-tested on their own.
"""

from __future__ import annotations

from typing import Any


def _as_model(model):
    # accept GBDTModel, SparkBooster, or pyspark.ml Model wrappers
    # (reference plotting.py accepts Booster or XGBModel the same way)
    if hasattr(model, "trees"):
        return model
    for attr in ("core", "model_", "model", "_model"):
        inner = getattr(model, attr, None)
        if inner is not None and hasattr(inner, "trees"):
            return inner
    raise TypeError("expected a GBDTModel or an estimator holding one, "
                    f"got {type(model).__name__}")


def importance_series(model, importance_type: str = "weight",
                      max_num_features: int | None = None) -> list[tuple[str, float]]:
    """(feature, score) pairs sorted ascending by score — the exact data
    ``plot_importance`` draws (reference plotting.py:21 sorts the same
    way for barh).  Dependency-free."""
    imp = _as_model(model).feature_importance(importance_type)
    items = sorted(imp.items(), key=lambda kv: (kv[1], kv[0]))
    if max_num_features is not None:
        items = items[-int(max_num_features):]
    return items


def plot_importance(model, ax=None, height: float = 0.2,
                    importance_type: str = "weight",
                    max_num_features: int | None = None,
                    title: str = "Feature importance",
                    xlabel: str = "Importance score",
                    ylabel: str = "Features",
                    show_values: bool = True,
                    values_format: str = "{v}",
                    grid: bool = True, **kwargs: Any):
    """Horizontal-bar feature importance plot (reference
    plotting.py:21).  Requires matplotlib."""
    try:
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover - matplotlib absent in CI image
        raise ImportError("plot_importance requires matplotlib") from e
    items = importance_series(model, importance_type, max_num_features)
    if not items:
        raise ValueError("feature importance is empty (untrained model?)")
    labels, values = zip(*items)
    if ax is None:
        _, ax = plt.subplots(1, 1)
    ylocs = range(len(values))
    ax.barh(ylocs, values, align="center", height=height, **kwargs)
    if show_values:
        for x, y in zip(values, ylocs):
            ax.text(x + 1, y, values_format.format(v=x), va="center")
    ax.set_yticks(ylocs)
    ax.set_yticklabels(labels)
    if title:
        ax.set_title(title)
    if xlabel:
        ax.set_xlabel(xlabel)
    if ylabel:
        ax.set_ylabel(ylabel)
    ax.grid(grid)
    return ax


def to_graphviz(model, num_trees: int = 0, rankdir: str | None = None,
                with_stats: bool = False):
    """DOT rendering of one tree (reference plotting.py:154).  Returns
    ``graphviz.Source`` when graphviz is importable, else the DOT source
    string (same content either way — built by ``GBDTModel.get_dot``)."""
    dot = _as_model(model).get_dot(num_trees, with_stats=with_stats)
    if rankdir is not None:
        dot = dot.replace("digraph {", f'digraph {{\n  graph [rankdir="{rankdir}"];', 1)
    try:
        import graphviz
    except ImportError:
        return dot
    return graphviz.Source(dot)


def plot_tree(model, num_trees: int = 0, rankdir: str | None = None,
              ax=None, with_stats: bool = False, **kwargs: Any):
    """Render one tree with matplotlib (reference plotting.py:286:
    graphviz -> PNG -> imshow).  Requires matplotlib AND graphviz."""
    try:
        import matplotlib.image as mpimg
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover
        raise ImportError("plot_tree requires matplotlib") from e
    src = to_graphviz(model, num_trees=num_trees, rankdir=rankdir,
                      with_stats=with_stats, **kwargs)
    if isinstance(src, str):  # pragma: no cover - graphviz absent
        raise ImportError("plot_tree requires graphviz to rasterize the tree")
    import io
    img = mpimg.imread(io.BytesIO(src.pipe(format="png")), format="png")
    if ax is None:
        _, ax = plt.subplots(1, 1)
    ax.imshow(img)
    ax.axis("off")
    return ax
