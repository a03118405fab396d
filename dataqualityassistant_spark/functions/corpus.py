"""Tiny deterministic multilingual seed corpus.

Used to (a) train the in-repo char-n-gram language-ID profiles and the
char-trigram perplexity model, and (b) generate synthetic pages fixtures.
All sentences are original filler prose written for this repo — no external
data, no model downloads. Everything derived from these strings is
deterministic.
"""

from __future__ import annotations

# Stopword list: the classic English function words (public knowledge).
EN_STOPWORDS = frozenset(
    """a an and are as at be but by for from has have he her his i if in into is it its
    of on or she so that the their them they this to was we were what when which who
    will with you your not no they're there then than can could would should do does
    did done just also more most some such only over under very too all any each"""
    .split()
)

EN_SENTENCES = [
    "The river carried the small boat past the old mill and under the stone bridge.",
    "She opened the window to let the morning light fall across the kitchen table.",
    "Most of the farmers in the valley had already gathered their crops before the rain came.",
    "He wrote a long letter to his brother about the journey through the mountains.",
    "The library was quiet except for the sound of pages turning near the back wall.",
    "After the meeting they walked along the harbor and talked about the coming winter.",
    "A good map of the region will show you where the trail crosses the river twice.",
    "The children planted seeds in the garden and watered them every day after school.",
    "When the train finally arrived, the platform was crowded with people and luggage.",
    "The museum keeps a collection of tools that were used on ships two hundred years ago.",
    "Every morning the baker set fresh loaves on the shelf before the first customers came.",
    "The committee agreed that the bridge should be repaired before the next flood season.",
    "In the evening the lamps along the street cast long shadows over the wet stones.",
    "They found that the old recipes worked best when the oven was not too hot.",
    "The teacher explained how the tides are pulled by the moon and the sun together.",
    "Travelers who follow the coast road will pass three lighthouses before reaching the port.",
    "The notebook contained careful drawings of leaves, seeds, and the insects that eat them.",
    "By the end of the summer the orchard gave more apples than the family could store.",
    "A narrow path leads from the village square up to the ruins on the hill.",
    "The engineers measured the depth of the channel before the ships were allowed through.",
]

DE_SENTENCES = [
    "Der Fluss trug das kleine Boot an der alten Mühle vorbei und unter die steinerne Brücke.",
    "Sie öffnete das Fenster, damit das Morgenlicht auf den Küchentisch fallen konnte.",
    "Die Bauern im Tal hatten ihre Ernte schon vor dem Regen eingebracht.",
    "Er schrieb seinem Bruder einen langen Brief über die Reise durch die Berge.",
    "Die Bibliothek war still bis auf das Geräusch der Seiten an der hinteren Wand.",
    "Nach der Sitzung gingen sie am Hafen entlang und sprachen über den kommenden Winter.",
    "Eine gute Karte der Gegend zeigt, wo der Weg den Fluss zweimal überquert.",
    "Die Kinder pflanzten Samen in den Garten und gossen sie jeden Tag nach der Schule.",
    "Als der Zug endlich ankam, war der Bahnsteig voller Menschen und Gepäck.",
    "Jeden Morgen legte der Bäcker frische Brote ins Regal, bevor die ersten Kunden kamen.",
]

FR_SENTENCES = [
    "La rivière portait le petit bateau devant le vieux moulin et sous le pont de pierre.",
    "Elle ouvrit la fenêtre pour laisser la lumière du matin tomber sur la table de la cuisine.",
    "La plupart des fermiers de la vallée avaient déjà rentré leurs récoltes avant la pluie.",
    "Il écrivit une longue lettre à son frère sur le voyage à travers les montagnes.",
    "La bibliothèque était silencieuse sauf le bruit des pages près du mur du fond.",
    "Après la réunion ils marchèrent le long du port et parlèrent de l'hiver qui venait.",
    "Une bonne carte de la région montre où le sentier traverse deux fois la rivière.",
    "Les enfants plantèrent des graines dans le jardin et les arrosèrent chaque jour.",
    "Quand le train arriva enfin, le quai était plein de monde et de bagages.",
    "Chaque matin le boulanger posait des pains frais sur l'étagère avant les premiers clients.",
]

ES_SENTENCES = [
    "El río llevaba el pequeño bote junto al viejo molino y bajo el puente de piedra.",
    "Ella abrió la ventana para dejar que la luz de la mañana cayera sobre la mesa de la cocina.",
    "La mayoría de los agricultores del valle ya habían recogido sus cosechas antes de la lluvia.",
    "Él escribió una larga carta a su hermano sobre el viaje por las montañas.",
    "La biblioteca estaba en silencio salvo el sonido de las páginas junto a la pared del fondo.",
    "Después de la reunión caminaron por el puerto y hablaron del invierno que venía.",
    "Un buen mapa de la región muestra dónde el sendero cruza el río dos veces.",
    "Los niños plantaron semillas en el jardín y las regaron cada día después de la escuela.",
    "Cuando el tren llegó por fin, el andén estaba lleno de gente y de equipaje.",
    "Cada mañana el panadero ponía panes frescos en el estante antes de los primeros clientes.",
]

LANG_SENTENCES: dict[str, list[str]] = {
    "en": EN_SENTENCES,
    "de": DE_SENTENCES,
    "fr": FR_SENTENCES,
    "es": ES_SENTENCES,
}

# Deterministic "toxicity" placeholder lexicon for the scrub stage. Real
# deployments swap in a curated list; the plumbing (ordered regex redaction,
# byte-identical across engines) is what matters here.
TOXIC_WORDS = ("frakking", "gorram", "smegging", "belgium")
