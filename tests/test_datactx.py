"""datactx.unreserved: scoped scheduling flag, restore + capture semantics."""

import ray.data
from ray.data import DataContext

from informationretrieval_en_people_cn_ray.datactx import unreserved


def test_unreserved_restores_flag_and_result():
    ctx = DataContext.get_current()
    assert ctx.op_resource_reservation_enabled is True  # ray default

    @unreserved
    def body(x):
        assert ctx.op_resource_reservation_enabled is False
        return x + 1

    assert body(1) == 2
    assert ctx.op_resource_reservation_enabled is True


def test_unreserved_restores_on_exception_and_nests():
    ctx = DataContext.get_current()

    @unreserved
    def outer():
        @unreserved
        def inner():
            assert ctx.op_resource_reservation_enabled is False
            raise ValueError("boom")

        try:
            inner()
        except ValueError:
            pass
        # inner's finally restored to OUTER's value (False), not True
        assert ctx.op_resource_reservation_enabled is False

    outer()
    assert ctx.op_resource_reservation_enabled is True


def test_dataset_captures_unreserved_context(ray_session):
    """Datasets created inside an @unreserved body keep the disabled flag
    after the global restore — the mechanism lazily-returned datapipe
    results rely on (ExecutionPlan._context is a copy)."""

    @unreserved
    def make():
        return ray.data.range(4)

    ds = make()
    assert DataContext.get_current().op_resource_reservation_enabled is True
    assert ds.context.op_resource_reservation_enabled is False
    assert ds.count() == 4
