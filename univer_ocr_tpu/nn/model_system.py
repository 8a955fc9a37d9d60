"""Pipeline orchestration: ordered components over a shared context dict.

Surface parity with reference model_system.py:1-167.  Components are the
unit of the OCR cascade (Monochrome -> crop -> Line -> crop -> Char -> text);
ModelComponents run jitted device steps, RawFunctionComponents run host CV
and host<->device staging.
"""


class BaseComponent:
    def train(self, context):
        raise NotImplementedError()

    def test(self, context):
        raise NotImplementedError()

    def predict(self, context):
        raise NotImplementedError()


class RawFunctionComponent(BaseComponent):
    def __init__(self, func):
        self.func = func

    def __call__(self, context):
        self.func(context)

    def train(self, context):
        self(context)

    def test(self, context):
        self(context)

    def predict(self, context):
        self(context)


class WrappedFunctionComponent(RawFunctionComponent):
    def __init__(self, name, func, *args_labels, **kwargs_labels):
        super().__init__(func)
        self.name = name
        self.args_labels = args_labels
        self.kwargs_labels = kwargs_labels

    def __call__(self, context):
        args = [context[v] for v in self.args_labels]
        kwargs = {k: context[v] for k, v in self.kwargs_labels.items()}
        context[self.name] = self.func(*args, **kwargs)


class BaseSelector:
    def __init__(self):
        self.context = None

    def __call__(self, context):
        self.context = context

    def get(self):
        raise NotImplementedError()

    def get_X(self):
        raise NotImplementedError()

    def put(self, pred):
        raise NotImplementedError()


class StringSelector(BaseSelector):
    """Single (X, y) pulled from context by key (reference :59-73)."""

    def __init__(self, X_label, y_label, pred_label):
        super().__init__()
        self.X_label = X_label
        self.y_label = y_label
        self.pred_label = pred_label

    def get(self):
        yield self.context[self.X_label], self.context[self.y_label]

    def get_X(self):
        yield self.context[self.X_label]

    def put(self, pred):
        self.context[self.pred_label] = pred


class IterableSelector(BaseSelector):
    """Loops over parallel X/y lists in the context (reference :76-94)."""

    def __init__(self, X_label, y_label, pred_label):
        super().__init__()
        self.X_label = X_label
        self.y_label = y_label
        self.pred_label = pred_label

    def get(self):
        for X, y in zip(self.context[self.X_label], self.context[self.y_label]):
            yield X, y

    def get_X(self):
        for X in self.context[self.X_label]:
            yield X

    def put(self, pred):
        if self.pred_label not in self.context.keys():
            self.context[self.pred_label] = []
        self.context[self.pred_label].append(pred)


class ModelComponent(BaseComponent):
    """Wraps a Model + Selector, accumulating per-model losses in the
    context (reference model_system.py:97-145)."""

    def __init__(self, name, model, selector, delist_result=False):
        self.name = name
        self.model = model
        self.selector = selector
        self.delist_result = delist_result

    def _record_losses(self, context, losses):
        if self.name not in context['losses']:
            context['losses'][self.name] = losses
        else:
            for k, v in losses.items():
                context['losses'][self.name][k] += v

    def _collect_result(self):
        result = [
            self.model.layers_outputs[k]
            for k in range(self.model.outputs_count)]
        if self.delist_result:
            result = result[0]
        return result

    def train(self, context):
        self.selector(context)
        for X, y in self.selector.get():
            losses = self.model.train(X, y)
            self._record_losses(context, losses)
            self.selector.put(self._collect_result())

    def test(self, context):
        self.selector(context)
        for X, y in self.selector.get():
            losses = self.model.test(X, y)
            self._record_losses(context, losses)
            self.selector.put(self._collect_result())

    def predict(self, context):
        self.selector(context)
        for X in self.selector.get_X():
            context['prediction'][self.name] = self.model.predict(X)
            self.selector.put(self._collect_result())


class ModelSystem:
    def __init__(self, components):
        assert isinstance(components, list)
        assert all(isinstance(c, BaseComponent) for c in components)
        self.components = components

    def train(self, context):
        context['losses'] = {}
        for component in self.components:
            component.train(context)

    def test(self, context):
        context['losses'] = {}
        for component in self.components:
            component.test(context)

    def predict(self, context):
        context['prediction'] = {}
        for component in self.components:
            component.predict(context)
