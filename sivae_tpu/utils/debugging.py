"""NaN/Inf localization via checkify (SURVEY §5 'sanitizers').

The reference's only runtime guard is `if torch.isnan(loss): raise
SystemError` (my_trainer.py:327-328). Under jit the equivalent cheap guard
is the `nan` flag in the step metrics; when it trips, wrap the step with
`checkify_step` to find WHICH op produced the first non-finite value.
"""

from __future__ import annotations

from typing import Callable


def checkify_step(step_fn: Callable) -> Callable:
    """Returns a jittable wrapper: (state, batch) -> (error, (state, metrics)).

    Call `error.throw()` host-side to raise with the failing op's location.
    ~2x slower than the raw step; debugging tool, not a production path.
    """
    import jax
    from jax.experimental import checkify

    checked = checkify.checkify(step_fn, errors=checkify.float_checks)

    def wrapped(state, batch):
        return checked(state, batch)

    return jax.jit(wrapped)
