from .numeric import davg, dround, dsum, epoch_seconds, sql_davg, sql_dround, sql_dsum, sql_epoch  # noqa: F401
