"""Training callbacks, mirroring the reference's callback API
(`python-package/xgboost/callback.py`: container :149,
LearningRateScheduler :272, EarlyStopping :311, EvaluationMonitor :511,
TrainingCheckPoint :586).

The driver loop calls:
    before_training(state) / after_training(state)
    before_iteration(state, epoch) -> bool (True = stop)
    after_iteration(state, epoch, evals_log) -> bool (True = stop)

``state`` is the live TrainingState handle: mutable ``eta`` (applied to
the NEXT tree), read-only round count, and ``save_snapshot(path)``.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence


class TrainingState:
    """Driver-side handle passed to callbacks."""

    def __init__(self, params, make_model: Callable[[], object]):
        self.params = params
        self.eta = params.eta
        self.stopped = False
        self._make_model = make_model

    def snapshot_model(self):
        """Materialize the model as of the completed rounds."""
        return self._make_model()


class TrainingCallback:
    def before_training(self, state: TrainingState):
        pass

    def after_training(self, state: TrainingState):
        pass

    def before_iteration(self, state: TrainingState, epoch: int) -> bool:
        return False

    def after_iteration(self, state: TrainingState, epoch: int,
                        evals_log: dict) -> bool:
        return False


class LearningRateScheduler(TrainingCallback):
    """Per-round learning rate (reference callback.py:272): pass a list
    of rates or a fn(epoch) -> eta."""

    def __init__(self, rates: Sequence[float] | Callable[[int], float]):
        self.rates = rates

    def before_iteration(self, state, epoch):
        state.eta = (self.rates(epoch) if callable(self.rates)
                     else self.rates[min(epoch, len(self.rates) - 1)])
        return False


class EvaluationMonitor(TrainingCallback):
    """Print eval results each period (reference callback.py:511)."""

    def __init__(self, period: int = 1):
        self.period = max(period, 1)

    def after_iteration(self, state, epoch, evals_log):
        from xgboost_spark.config import get_config
        if get_config()["verbosity"] < 1:
            return False
        if epoch % self.period == 0:
            parts = []
            for data, metrics in evals_log.items():
                for m, vals in metrics.items():
                    if vals:
                        parts.append(f"{data}-{m}:{vals[-1]:.5f}")
            if parts:
                print(f"[{epoch}]\t" + "\t".join(parts))
        return False


class EarlyStopping(TrainingCallback):
    """Stop after ``rounds`` non-improving iterations on the LAST metric
    of the LAST eval set (reference callback.py:311 semantics)."""

    def __init__(self, rounds: int, maximize: bool | None = None,
                 min_delta: float = 0.0):
        self.rounds = rounds
        self.maximize = maximize
        self.min_delta = min_delta
        self.best = None
        self.best_iteration = None

    def _better(self, a: float, b: float, maximize: bool) -> bool:
        return a > b + self.min_delta if maximize else a < b - self.min_delta

    def after_iteration(self, state, epoch, evals_log):
        if not evals_log:
            return False
        data = list(evals_log)[-1]
        metric = list(evals_log[data])[-1]
        vals = evals_log[data][metric]
        if not vals:
            return False
        cur = vals[-1]
        maximize = (self.maximize if self.maximize is not None
                    else metric.partition("@")[0] in
                    ("auc", "aucpr", "ndcg", "map", "pre"))
        if self.best is None or self._better(cur, self.best, maximize):
            self.best = cur
            self.best_iteration = epoch
            return False
        return epoch - self.best_iteration >= self.rounds


class TrainingCheckPoint(TrainingCallback):
    """Save a model snapshot every ``interval`` rounds
    (reference callback.py:586)."""

    def __init__(self, directory: str, name: str = "model", interval: int = 1):
        import os
        self.directory = directory
        self.name = name
        self.interval = max(interval, 1)
        os.makedirs(directory, exist_ok=True)

    def after_iteration(self, state, epoch, evals_log):
        if (epoch + 1) % self.interval == 0:
            import os
            state.snapshot_model().save(
                os.path.join(self.directory, f"{self.name}_{epoch}.json"))
        return False
