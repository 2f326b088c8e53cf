"""coneqp placeholder — filled in next."""
def coneqp(*a, **k):
    raise NotImplementedError
def make_coneqp(*a, **k):
    raise NotImplementedError
