"""Per-layer event timing streamed to the training dashboard.

Emits the reference's websocket summary schema (progress_tracker.py:5-126:
`{layer: [{name, done, started, stopped, time, counter}, ...]}` fired
through a handler on every start/stop) from a different store: one flat
``(layer, event) -> _Timing`` dict measured with `time.perf_counter`
(monotonic; the reference subtracts wall-clock datetimes, which jumps
under NTP adjustment), materialized into the schema only when a summary
is requested.  On TPU the timed quantity is *host-side step dispatch
time* (XLA is async); model steps additionally call `block_until_ready`
at step boundaries so timings reflect real device work.
"""

import time
from datetime import datetime, timedelta
from functools import wraps


class Event:
    """Cumulative timer for one (layer, event) pair.

    Exposes the reference Event's fields; internally accumulates float
    seconds from perf_counter, converting to timedelta/datetime only at
    the schema boundary.
    """

    __slots__ = ('name', 'done', 'started', 'stopped', 'counter',
                 '_seconds', '_t0')

    def __init__(self, name):
        self.name = name
        self.reset()

    def reset(self):
        self.done = False
        self.started = None
        self.stopped = None
        self.counter = 0
        self._seconds = None
        self._t0 = None

    def start(self):
        self.done = False
        self.started = datetime.now()
        self._t0 = time.perf_counter()

    def stop(self):
        elapsed = time.perf_counter() - self._t0
        self._seconds = elapsed + (self._seconds or 0.0)
        self.stopped = datetime.now()
        self.done = True
        self.counter += 1

    @property
    def time(self):
        if self._seconds is None:
            return None
        return timedelta(seconds=self._seconds)

    def to_dict(self):
        return {field: getattr(self, field)
                for field in ('name', 'done', 'started', 'stopped',
                              'time', 'counter')}


class BaseProgressTracker:
    """No-op default (reference progress_tracker.py:43-63)."""

    def __init__(self, *args, **kwargs):
        pass

    def register_layer(self, name):
        pass

    def get_summary(self):
        return {}

    def start_tracking(self, name, event):
        pass

    def stop_tracking(self, name, event):
        pass

    def message(self, message, data=None):
        pass

    def reset(self):
        pass


class ProgressTracker(BaseProgressTracker):
    """Tracks (layer, event) timings in a flat dict; every start/stop
    fires `handler(event_name, summary)` with the full summary so the
    dashboard repaints its per-layer table live."""

    def __init__(self, handler=print):
        self.handler = handler
        self._events = {}          # (layer, event_name) -> Event
        self._layer_order = []     # layers in registration/first-use order

    def _layer_known(self, name):
        if name not in self._layer_order:
            self._layer_order.append(name)

    def register_layer(self, name):
        self._layer_known(name)

    @property
    def layers(self):
        """Reference-shaped view: {layer: {event_name: Event}}."""
        view = {name: {} for name in self._layer_order}
        for (layer, event_name), event in self._events.items():
            view[layer][event_name] = event
        return view

    def get_summary(self):
        summary = {name: [] for name in self._layer_order}
        for (layer, _), event in self._events.items():
            summary[layer].append(event.to_dict())
        return summary

    def _event(self, name, event):
        self._layer_known(name)
        key = (name, event)
        if key not in self._events:
            self._events[key] = Event(event)
        return self._events[key]

    def start_tracking(self, name, event):
        self._event(name, event).start()
        self.handler(event, self.get_summary())

    def stop_tracking(self, name, event):
        self._event(name, event).stop()
        self.handler(event, self.get_summary())

    def message(self, message, data=None):
        self.handler(message, data)

    def reset(self):
        self.handler('reset')
        for event in self._events.values():
            event.reset()


def track_method(event):
    """Time a method of an object exposing .progress_tracker and .name."""
    def decorator(func):
        @wraps(func)
        def wrapper(self, *args, **kwargs):
            tracker = self.progress_tracker
            tracker.start_tracking(self.name, event)
            try:
                return func(self, *args, **kwargs)
            finally:
                tracker.stop_tracking(self.name, event)
        return wrapper
    return decorator


def track_function(name, event, progress_tracker):
    """Time a free function; identity decorator when tracker is None
    (reference :112-126)."""
    if progress_tracker is None:
        return lambda func: func
    progress_tracker.register_layer(name)

    def decorator(func):
        @wraps(func)
        def wrapper(*args, **kwargs):
            progress_tracker.start_tracking(name, event)
            try:
                return func(*args, **kwargs)
            finally:
                progress_tracker.stop_tracking(name, event)
        return wrapper
    return decorator
