"""Full pipelines (the operator library), composed of stages + kernels."""
