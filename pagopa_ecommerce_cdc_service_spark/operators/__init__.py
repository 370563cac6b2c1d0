from .cdc_fold import (  # noqa: F401
    fold_transactions_view,
    parse_creation_date_millis,
    prepare_events,
    transactions_view_from_log,
)
