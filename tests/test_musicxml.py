import pytest

from scoreperformer_tpu.data.musicxml_directions import (
    parse_directions,
    read_musicxml,
    word_regularization,
    hairpin_word_regularization,
)

MUSICXML = """<?xml version="1.0"?>
<score-partwise version="3.1">
  <part id="P1">
    <measure number="1">
      <attributes><divisions>4</divisions>
        <time><beats>4</beats><beat-type>4</beat-type></time>
      </attributes>
      <direction placement="below">
        <direction-type><dynamics><p/></dynamics></direction-type>
        <staff>1</staff>
      </direction>
      <note><pitch><step>C</step><octave>4</octave></pitch><duration>4</duration>
        <notations><articulations><staccato/></articulations></notations>
      </note>
      <note><pitch><step>E</step><octave>4</octave></pitch><duration>4</duration></note>
      <note><chord/><pitch><step>G</step><octave>4</octave></pitch><duration>4</duration></note>
      <note><pitch><step>C</step><octave>5</octave></pitch><duration>8</duration></note>
    </measure>
    <measure number="2">
      <direction>
        <direction-type><wedge type="crescendo" number="1"/></direction-type>
      </direction>
      <note><pitch><step>D</step><octave>4</octave></pitch><duration>8</duration></note>
      <direction>
        <direction-type><wedge type="stop" number="1"/></direction-type>
      </direction>
      <direction>
        <direction-type><dynamics><ff/></dynamics></direction-type>
      </direction>
      <note><pitch><step>E</step><octave>4</octave></pitch><duration>8</duration>
        <notations><fermata/></notations>
      </note>
    </measure>
    <measure number="3">
      <direction>
        <direction-type><words>Allegro.</words></direction-type>
      </direction>
      <note><pitch><step>F</step><octave>4</octave></pitch><duration>16</duration></note>
    </measure>
  </part>
</score-partwise>
"""


class TestMusicXMLReader:
    def test_positions_and_notes(self):
        parts = read_musicxml(MUSICXML)
        assert len(parts) == 1
        part = parts[0]
        assert part.measure_positions == [0, 16, 32]
        # chord note shares position with its head
        positions = [n.xml_position for n in part.notes]
        assert positions == [0, 4, 4, 8, 16, 24, 32]
        assert part.notes[0].is_staccato
        assert part.notes[5].is_fermata

    def test_directions_extracted(self):
        part = read_musicxml(MUSICXML)[0]
        kinds = [d.kind for d in part.directions]
        assert "dynamic" in kinds and "crescendo" in kinds and "words" in kinds


class TestParseDirections:
    def test_full_parse(self):
        dirs = parse_directions(MUSICXML)[0]
        types = {d["type"] for d in dirs}
        assert "dynamic/p" in types
        assert "dynamic/crescendo" in types
        assert "dynamic/ff" in types
        assert "tempo/allegro" in types
        assert "articulation/staccato" in types
        assert "articulation/fermata" in types

        # dynamic/p range closed by the ff marking
        p = next(d for d in dirs if d["type"] == "dynamic/p")
        ff = next(d for d in dirs if d["type"] == "dynamic/ff")
        assert p["start"] == 0 and p["end"] == ff["start"]

        # hairpin covers measure-2 start to its stop position
        cresc = next(d for d in dirs if d["type"] == "dynamic/crescendo")
        assert cresc["start"] == 16 and cresc["end"] == 24

        # tempo word runs to the end of the piece
        allegro = next(d for d in dirs if d["type"] == "tempo/allegro")
        assert allegro["start"] == 32
        assert allegro["end"] >= 48

    def test_word_regularization(self):
        assert word_regularization(" Allegro,\nMolto ") == "allegro molto"
        assert hairpin_word_regularization("poco a poco cresc") == "crescendo"
        assert hairpin_word_regularization("decresc.") == "diminuendo"
