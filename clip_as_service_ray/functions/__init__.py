"""Pure kernels: no Ray imports here — everything in this package is a plain
function over Python/numpy/pyarrow values, unit-testable without a cluster."""
