"""Default ``format`` validators.

Regex patterns and semantics track the reference's table
(reference: lib/json_schema/validator.rb:569-604): ``date`` is a
regex plus a calendar-validity check, ``uri``/``uri-reference``
accept anything Ruby's RFC 3986 URI parser accepts (including
relative references), ``regex`` checks compilability.
"""

from __future__ import annotations

import re
from datetime import datetime


DATE_PATTERN = re.compile(r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$", re.M)

DATE_TIME_PATTERN = re.compile(
    r"^[0-9]{4}-[0-9]{2}-[0-9]{2}T[0-2][0-9]:[0-5][0-9]:[0-5][0-9]"
    r"(\.[0-9]+)?(Z|[\-+][0-9]{2}:[0-5][0-9])$",
    re.M,
)

EMAIL_PATTERN = re.compile(r"^[A-Z0-9._%+-]+@[A-Z0-9.-]+\.[A-Z]+$", re.I | re.M)

HOSTNAME_PATTERN = re.compile(
    r"^(?=.{1,255}$)[0-9A-Za-z](?:(?:[0-9A-Za-z]|-){0,61}[0-9A-Za-z])?"
    r"(?:\.[0-9A-Za-z](?:(?:[0-9A-Za-z]|-){0,61}[0-9A-Za-z])?)*\.?$",
    re.M,
)

IPV4_PATTERN = re.compile(
    r"^((25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])\.){3,3}"
    r"(25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])$",
    re.M,
)

IPV6_PATTERN = re.compile(
    r"^(([0-9a-fA-F]{1,4}:){7,7}[0-9a-fA-F]{1,4}|([0-9a-fA-F]{1,4}:){1,7}:|"
    r"([0-9a-fA-F]{1,4}:){1,6}:[0-9a-fA-F]{1,4}|"
    r"([0-9a-fA-F]{1,4}:){1,5}(:[0-9a-fA-F]{1,4}){1,2}|"
    r"([0-9a-fA-F]{1,4}:){1,4}(:[0-9a-fA-F]{1,4}){1,3}|"
    r"([0-9a-fA-F]{1,4}:){1,3}(:[0-9a-fA-F]{1,4}){1,4}|"
    r"([0-9a-fA-F]{1,4}:){1,2}(:[0-9a-fA-F]{1,4}){1,5}|"
    r"[0-9a-fA-F]{1,4}:((:[0-9a-fA-F]{1,4}){1,6})|"
    r":((:[0-9a-fA-F]{1,4}){1,7}|:)|"
    r"fe80:(:[0-9a-fA-F]{0,4}){0,4}%[0-9a-zA-Z]{1,}|"
    r"::(ffff(:0{1,4}){0,1}:){0,1}"
    r"((25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9]).){3,3}"
    r"(25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])|"
    r"([0-9a-fA-F]{1,4}:){1,4}:)$",
    re.M,
)

UUID_PATTERN = re.compile(r"^[a-f0-9]{8}-[a-f0-9]{4}-[a-f0-9]{4}-[a-f0-9]{4}-[a-f0-9]{12}$", re.M)


def _valid_date(data: str) -> bool:
    if not DATE_PATTERN.search(data):
        return False
    try:
        datetime.strptime(data, "%Y-%m-%d")
        return True
    except ValueError:
        return False


def _valid_regex(data: str) -> bool:
    try:
        re.compile(data)
        return True
    except re.error:
        return False


# RFC 3986 URI / relative-reference grammar, approximating what Ruby's
# URI.parse accepts (both absolute URIs and relative references).
_PCT = r"%[0-9A-Fa-f]{2}"
_UNRESERVED = r"[A-Za-z0-9\-._~]"
_SUB_DELIMS = r"[!$&'()*+,;=]"
_PCHAR = f"(?:{_UNRESERVED}|{_PCT}|{_SUB_DELIMS}|[:@])"
_SEGMENT = f"{_PCHAR}*"
_SEGMENT_NZ = f"{_PCHAR}+"
_REG_NAME = f"(?:{_UNRESERVED}|{_PCT}|{_SUB_DELIMS})*"
_IP_LITERAL = r"\[[0-9A-Fa-f:.]+\]"
_USERINFO = f"(?:{_UNRESERVED}|{_PCT}|{_SUB_DELIMS}|:)*"
_HOST = f"(?:{_IP_LITERAL}|{_REG_NAME})"
_AUTHORITY = f"(?:{_USERINFO}@)?{_HOST}(?::[0-9]*)?"
_PATH_ABEMPTY = f"(?:/{_SEGMENT})*"
_PATH_ABSOLUTE = f"/(?:{_SEGMENT_NZ}(?:/{_SEGMENT})*)?"
_PATH_ROOTLESS = f"{_SEGMENT_NZ}(?:/{_SEGMENT})*"
_QUERY = f"(?:{_PCHAR}|[/?])*"
_FRAGMENT = _QUERY
_SCHEME = r"[A-Za-z][A-Za-z0-9+.\-]*"
_HIER_PART = f"(?://{_AUTHORITY}{_PATH_ABEMPTY}|{_PATH_ABSOLUTE}|{_PATH_ROOTLESS}|)"
# relative-part's first segment must not contain ":"
_SEGMENT_NZ_NC = f"(?:{_UNRESERVED}|{_PCT}|{_SUB_DELIMS}|@)+"
_PATH_NOSCHEME = f"{_SEGMENT_NZ_NC}(?:/{_SEGMENT})*"
_RELATIVE_PART = f"(?://{_AUTHORITY}{_PATH_ABEMPTY}|{_PATH_ABSOLUTE}|{_PATH_NOSCHEME}|)"

URI_RE = re.compile(
    f"\\A(?:{_SCHEME}:{_HIER_PART}|{_RELATIVE_PART})(?:\\?{_QUERY})?(?:#{_FRAGMENT})?\\Z"
)


def _valid_uri(data: str) -> bool:
    return URI_RE.match(data) is not None


DEFAULT_FORMAT_VALIDATORS = {
    "date": _valid_date,
    "date-time": lambda data: DATE_TIME_PATTERN.search(data) is not None,
    "email": lambda data: EMAIL_PATTERN.search(data) is not None,
    "hostname": lambda data: HOSTNAME_PATTERN.search(data) is not None,
    "ipv4": lambda data: IPV4_PATTERN.search(data) is not None,
    "ipv6": lambda data: IPV6_PATTERN.search(data) is not None,
    "regex": _valid_regex,
    "uri": _valid_uri,
    "uri-reference": _valid_uri,
    "uuid": lambda data: UUID_PATTERN.search(data) is not None,
}
