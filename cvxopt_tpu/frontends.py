"""front-ends placeholder — filled in next."""
def lp(*a, **k):
    raise NotImplementedError
def qp(*a, **k):
    raise NotImplementedError
def socp(*a, **k):
    raise NotImplementedError
def sdp(*a, **k):
    raise NotImplementedError
