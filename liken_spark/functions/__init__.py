"""Scalar/batch kernels used by the operators (similarity scorers, text
analysis helpers). All batch-oriented; invoked from Arrow-batched UDFs."""
