"""Unit tests for the scalar kernels (SURVEY.md §2.2 N1-N11)."""

from akf_cdparser_ray.functions import regex_lib as rl
from akf_cdparser_ray.functions import text_utils as tu


def test_match_percentage():
    assert rl.match_percentage("(12,11%) and 5 %") == ["12,11%", "5 %"]
    assert rl.match_percentage("nothing") is None


def test_match_year():
    assert rl.match_year("1999 Gründungskapital") == "1999"
    assert rl.match_year("x1999") is None


def test_match_number():
    assert rl.match_number("EUR 6 000,50 and 12.3") == ["6", "000,50", "12.3"]
    assert rl.match_number("abc") is None


def test_strip_html_tags():
    assert rl.strip_html_tags("<b>Hi</b> there<br>") == "Hi there"


def test_replace_comma_in_number():
    assert rl.replace_comma_in_number("12,5 und 3,4%") == "12.5 und 3.4%"
    assert rl.replace_comma_in_number("keine Zahl") == "keine Zahl"


def test_remove_leading_character():
    assert rl.remove_leading_character(",text", ",") == "text"
    assert rl.remove_leading_character(",,text", ",") == "text"
    assert rl.remove_leading_character("text", ",") == "text"


def test_replace_semicolon_and_comma_in_brackets():
    s = "This, is (bracket;content);other (x,y)"
    out = rl.replace_semicolon_and_comma_in_brackets(s)
    assert out == "This, is (bracket content);other (x y)"


def test_match_from_string_to_string():
    got = rl.match_from_string_to_string("Tel.: (08241) 5 03-2 58, mehr", r"Tel\.:", ",")
    assert got is not None
    assert got[1] == "(08241) 5 03-2 58"


def test_parens_helpers():
    assert rl.match_between_parenthesis("a (b) c") == "(b) c".replace(" c", "")[:3] or True
    assert rl.match_between_parenthesis("a (b) c") == "(b)"
    assert rl.remove_last_comma("a, b, ") == "a, b"
    assert rl.does_end_with_colon("Header: ")
    assert rl.remove_last_colon("Header: ") == "Header"
    assert rl.remove_parenthesis("(a)b") == "ab"


def test_check_if_string_is_in_parenthesis():
    assert rl.check_if_string_is_in_parenthesis("20%", "Firm (zusammen 20% haltend)") is not None
    assert rl.check_if_string_is_in_parenthesis("20%", "Firm, 20%") is None


def test_clean_text():
    assert tu.clean_text("Ab,c;(d):e.-f") == "ab c d e f"


def test_html_text_to_text():
    assert tu.html_text_to_text("<td><b>4MBO</b> &amp; Co</td>") == "4MBO & Co"


def test_leaf_nodes():
    got = tu.leaf_nodes({"a": [1, {"b": "x"}], "c": "y"})
    assert got == [1, "x", "y"]


def test_remove_empty_entries():
    assert tu.remove_empty_entries_from_array(["", None, {}, "a", {"k": 1}]) == ["a", {"k": 1}]
    assert tu.remove_empty_entries_from_object({"a": None, "b": 1}) == {"b": 1}


def test_remove_strings_from_string():
    assert tu.remove_strings_from_string("abc def abc", ["abc", "def"]) == "  abc"


def test_get_parenthesis_content():
    assert tu.get_parenthesis_content("x (a (b) c) y (d)") == ["(a (b) c)", "(d)"]
    assert tu.get_parenthesis_content("x (unclosed", True) == ["(unclosed)"]


def test_remove_last_characters():
    assert tu.remove_last_characters("Firma Kdt.", "Kdt.") == ("Firma", True)
    assert tu.remove_last_characters("Firma", "Kdt.") == ("Firma", False)


def test_split_at_first():
    assert tu.split_at_first("Telefon: 123: 456", ":") == ("Telefon", " 123: 456")
