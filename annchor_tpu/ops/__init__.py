"""Device kernels: metric evaluation, features, locality, pair ops."""
