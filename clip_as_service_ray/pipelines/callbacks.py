"""Per-request-batch streaming callbacks — the reference client contract
(client/clip_client/client.py:233-252,302-327, pinned by
tests/test_client.py:147-195):

- the input list is cut into request batches (``batch_size``; one batch by
  default, matching a single-request call);
- ``on_done(response)`` fires after each SUCCESSFUL batch,
- ``on_error(exception)`` after each FAILED batch (the exception object is
  this transport's response analog),
- ``on_always(response_or_exception)`` after every batch either way;
- when ``on_done`` or ``on_always`` is given the call returns ``None`` —
  the callbacks own the results (the reference gathers results only when
  neither is set, client.py:306-309, and its callback tests assert
  ``r is None``);
- with ``on_error`` set, a failed batch is ROUTED (streaming continues);
  without it, the first failure raises, after ``on_always`` has seen it;
- with ``batch_size`` set but NO callbacks, list responses concatenate
  (search/encode/rank keep their shape) while dict responses collect into
  a LIST of per-batch acks (e.g. batched ``aindex`` returns one status
  dict per batch — callers that batch a dict-shaped op should expect the
  list or pass ``on_done``).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable


def _batches(items: list, batch_size: int | None) -> Iterable[list]:
    bs = batch_size or len(items) or 1
    for off in range(0, len(items), bs):
        yield items[off : off + bs]


def stream_batches(
    items: list,
    call: Callable[[list], Any],
    *,
    batch_size: int | None = None,
    on_done: Callable | None = None,
    on_error: Callable | None = None,
    on_always: Callable | None = None,
):
    gather = on_done is None and on_always is None
    out: list = []
    for batch in _batches(items, batch_size):
        try:
            resp = call(batch)
        except Exception as e:  # noqa: BLE001 — routed per the contract
            if on_always is not None:
                on_always(e)
            if on_error is None:
                raise
            on_error(e)
            continue
        if on_done is not None:
            on_done(resp)
        if on_always is not None:
            on_always(resp)
        if gather:
            out.extend(resp) if isinstance(resp, list) else out.append(resp)
    return out if gather else None


async def astream_batches(
    items: list,
    call,
    *,
    batch_size: int | None = None,
    on_done: Callable | None = None,
    on_error: Callable | None = None,
    on_always: Callable | None = None,
):
    """Async twin of ``stream_batches`` (``call`` is a coroutine function;
    callbacks stay synchronous, as in the reference's mocked tests)."""
    gather = on_done is None and on_always is None
    out: list = []
    for batch in _batches(items, batch_size):
        try:
            resp = await call(batch)
        except Exception as e:  # noqa: BLE001
            if on_always is not None:
                on_always(e)
            if on_error is None:
                raise
            on_error(e)
            continue
        if on_done is not None:
            on_done(resp)
        if on_always is not None:
            on_always(resp)
        if gather:
            out.extend(resp) if isinstance(resp, list) else out.append(resp)
    return out if gather else None
