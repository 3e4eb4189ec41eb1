from .gender import gender_lookup_df, with_gender
from .names import with_name_parts

__all__ = ["gender_lookup_df", "with_gender", "with_name_parts"]
