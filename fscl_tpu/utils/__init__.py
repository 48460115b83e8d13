from .logging import (  # noqa: F401
    MSG_FATAL,
    MSG_ERROR,
    MSG_WARN,
    MSG_STATUS,
    MSG_DEBUG1,
    MSG_DEBUG2,
    configure_logmsg,
    logmsg,
    cr_logmsg,
)
