from .inspect import (explain_summary, assert_pushdown,  # noqa: F401
                      formatted_plan)
