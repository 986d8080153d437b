from .explain import plan_summary, assert_pushed_filters, assert_max_exchanges  # noqa: F401
