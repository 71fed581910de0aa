"""Query plans: the analytics layer and the end-to-end pipeline."""
