"""Samplers: choose the training pairs for the distance regression
(reference annchor/samplers.py).

Stratified over one feature (default "double anchor distance") so the
regression sees the full distance range, not just the bulk.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np

__all__ = [
    "NothingToSample",
    "Sampler",
    "SimpleStratifiedSampler",
    "ClusterSampler",
    "SamplingError",
]


class NothingToSample(Exception):
    pass


class SamplingError(Exception):
    pass


class Sampler(ABC):
    """Base sampler (reference samplers.py:22-110).

    Subclasses implement get_partition(sample_feature, n_samples) ->
    (sample_bins, new_n_samples); sampling within bins is uniform
    without replacement.
    """

    def __init__(self, partition_feature_name, n_partitions):
        self.partition_feature_name = partition_feature_name
        self.n_partitions = n_partitions
        self.loop_num = 0

    @abstractmethod
    def get_partition(self, sample_feature, n_samples):
        ...

    def sample_partition(
        self, indices, n_samples, sample_feature, sample_bins, random_seed
    ):
        bin_size = n_samples // self.n_partitions
        remainder = n_samples % self.n_partitions
        rng = np.random.default_rng(random_seed + self.loop_num)
        self.loop_num += 1

        chosen = []
        for nbin in range(self.n_partitions):
            want = bin_size + (nbin < remainder)
            mask = (sample_feature >= sample_bins[nbin]) & (
                sample_feature < sample_bins[nbin + 1]
            )
            ixmask = indices[mask]
            if ixmask.shape[0] < want:
                got = ixmask
            else:
                got = rng.choice(ixmask, size=want, replace=False)
            if len(got) < 2:
                raise SamplingError(
                    "Some sampler bins contain too few samples"
                )
            chosen.append(got)
        return np.concatenate(chosen)

    def sample(
        self,
        features,
        feature_names,
        n_samples,
        not_computed_mask,
        random_seed,
    ):
        if not not_computed_mask.any():
            raise NothingToSample()

        i_feature = feature_names.index(self.partition_feature_name)
        # slice the column first: copying one column beats copying the
        # whole (m, 4) feature matrix every iteration
        sample_feature = features[:, i_feature][not_computed_mask]
        indices = np.arange(not_computed_mask.shape[0])[not_computed_mask]

        sample_bins, new_n_samples = self.get_partition(
            sample_feature, n_samples
        )
        if new_n_samples != n_samples:
            print(
                "Warning: n_samples has changed from %d to %d."
                % (n_samples, new_n_samples)
            )
        n_samples = new_n_samples
        if n_samples == 0:
            raise NothingToSample()

        sample_ixs = self.sample_partition(
            indices, n_samples, sample_feature, sample_bins, random_seed
        )
        if n_samples != sample_ixs.shape[0]:
            print("Warning: Some bins contained fewer samples than requested")
        return sample_ixs, sample_ixs.shape[0], sample_bins


class SimpleStratifiedSampler(Sampler):
    """Linear bins between the 1%/99% feature quantiles (reference
    samplers.py:113-140), widening to 10%/90% for small data."""

    def __init__(
        self, partition_feature_name="double anchor distance", n_partitions=7
    ):
        super().__init__(partition_feature_name, n_partitions)

    def get_partition(self, sample_feature, n_samples):
        n = sample_feature.shape[0]
        iq1 = int(n / 100)
        iq3 = int(99 * n / 100)
        if (iq1 * self.n_partitions) < n_samples:
            iq1 = int(n / 10)
            iq3 = int(9 * n / 10)
        if (iq1 * self.n_partitions) < n_samples:
            n_samples = iq1 * self.n_partitions
            print(
                "Warning: n_samples too large for data set size.\n"
                + "Reducing n_samples to %d." % n_samples
            )
        q1 = np.partition(sample_feature, iq1)[iq1]
        q3 = np.partition(sample_feature, iq3)[iq3]
        sample_bins = np.linspace(q1, q3, self.n_partitions - 1)
        sample_bins = np.hstack([-np.inf, sample_bins, np.inf])
        return sample_bins, n_samples


class ClusterSampler(Sampler):
    """1-D KMeans bin edges (reference samplers.py:143-170)."""

    def __init__(
        self, partition_feature_name="double anchor distance", n_partitions=5
    ):
        super().__init__(partition_feature_name, n_partitions)

    def get_partition(self, sample_feature, n_samples):
        from sklearn.cluster import KMeans

        kmeans = KMeans(n_clusters=self.n_partitions, n_init=10)
        labels = kmeans.fit_predict(sample_feature.reshape(-1, 1))
        partitions = np.array(
            [
                [
                    np.min(sample_feature[labels == i]),
                    np.max(sample_feature[labels == i]),
                ]
                for i in range(self.n_partitions)
            ]
        )
        partitions = np.sort(partitions.flatten())
        sample_bins = partitions[1:-1:2]
        sample_bins = np.hstack([-np.inf, sample_bins, np.inf])
        return sample_bins, n_samples
