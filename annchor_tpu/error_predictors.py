"""Empirical error model (reference annchor/error_predictors.py:18-83).

Per partition bin, the fitted artefact is simply the *sorted array of
residuals* (d - dhat) — an empirical CDF.  "Predict" assigns each pair
its bin label; the refinement step turns a margin p into a probability
with a searchsorted CDF lookup (reference utils.py:581-589 /
annchor_tpu.ops.pairs.empirical_cdf_probs).
"""

from __future__ import annotations

import numpy as np

__all__ = ["SimpleStratifiedErrorRegression"]


class SimpleStratifiedErrorRegression:
    def __init__(
        self, partition_feature_name="double anchor distance", n_partitions=7
    ):
        self.n_partitions = n_partitions
        self.partition_feature_name = partition_feature_name
        self.labels = range(n_partitions)
        self.errs = {}
        self.partition_bins = None

    def fit(
        self, sample_features, feature_names, sample_error, sample_bins=None
    ):
        i_feature = feature_names.index(self.partition_feature_name)
        sample_feature = sample_features[:, i_feature]

        if sample_bins is None:
            n = sample_feature.shape[0]
            iq1 = int(n / 100)
            iq3 = int(99 * n / 100)
            q1 = np.partition(sample_feature, iq1)[iq1]
            q3 = np.partition(sample_feature, iq3)[iq3]
            bins = np.linspace(q1, q3, self.n_partitions - 1)
            self.partition_bins = np.hstack([-np.inf, bins, np.inf])
        else:
            self.n_partitions = sample_bins.shape[0] - 1
            self.partition_bins = sample_bins

        self.labels = range(self.n_partitions)
        self.errs = {}
        for nbin in range(self.n_partitions):
            mask = (sample_feature >= self.partition_bins[nbin]) & (
                sample_feature <= self.partition_bins[nbin + 1]
            )
            self.errs[nbin] = np.sort(sample_error[mask])

    def predict(self, features, feature_names):
        i_feature = feature_names.index(self.partition_feature_name)
        feature = features[:, i_feature]
        # single searchsorted pass (the per-bin mask loop costs
        # n_partitions full passes over the pair array — noticeable at
        # tens of millions of candidate pairs)
        labels = np.searchsorted(
            self.partition_bins[1:-1], feature, side="right"
        )
        return np.clip(labels, 0, self.n_partitions - 1)

    def update_errors(self, errors, partitions):
        for i in range(self.n_partitions):
            mask = partitions == i
            new = errors[mask]
            new = new[np.abs(new) > 1e-6]
            self.errs[i] = np.sort(np.hstack([self.errs[i], new]))
