#!/usr/bin/env python3
"""Generate src/main/resources/codelists/dictionary.txt.

A deterministic, hand-curated English lexicon (stand-in for
pyspellchecker's frequency dictionary, which cannot be fetched in this
zero-egress sandbox): curated stems expanded with conservative
inflection rules (regular plurals, regular verb forms with e-drop and
consonant doubling, -ly adverbs), plus irregular forms, function words,
and meteorology/geoscience/data-engineering domain vocabulary.

Intentionally excluded: 'wether' (valid but obscure; kept out so the
engine's spell-check goldens exercise a detectable near-miss of
'weather' — see FunctionsSpec).
"""
import re, sys, os

OUT = os.path.join(os.path.dirname(__file__),
                   '../src/main/resources/codelists/dictionary.txt')

words = set()


def add(text):
    for w in re.split(r'[\s,]+', text.strip()):
        if w:
            words.add(w.lower())


# ---- function words, pronouns, determiners, conjunctions, prepositions
add("""
a an the this that these those some any each every either neither no not
i you he she it we they me him her us them my your his its our their mine
yours hers ours theirs myself yourself himself herself itself ourselves
themselves who whom whose which what where when why how whether if unless
because since although though while whereas and or but nor so yet for as
of in on at by with from to into onto upon about above below under over
between among through throughout during before after until till toward
towards against within without across along around behind beside besides
beyond despite except inside outside near past per than up down off out
again further then once here there all both few more most other such only
own same too very can will just should now also however therefore thus
moreover furthermore meanwhile otherwise instead indeed perhaps maybe
almost already always never often sometimes usually rarely soon still
together apart away back forward anyway anywhere everywhere nowhere
somewhere else yesterday today tomorrow tonight ago twice thrice
nevertheless nonetheless hence thereby wherein whereby overall
""")

# ---- negative-prefix adjectives/adverbs (not derivable by rule)
add("""
inconsistent inconsistently inaccurate inaccurately incomplete
incorrect incorrectly inadequate inadequately inactive indirect
indirectly insufficient insufficiently invisible infrequent
infrequently informal informally invaluable inoperable insecure
unusual unusually unexpected unexpectedly unlimited unchanged
undefined unrelated unsupported unverified uneven unevenly unsafe
unclear uncommon unavailable unreliable unreadable unreachable
unresolved unsorted unsigned untested untracked unused unwanted
unidentified unofficial unplanned unprocessed unpublished unspecified
unsuccessful unsuccessfully nonzero nonempty nonlinear nontrivial
misleading misconfigured mismatched disabled disconnected discontinued
""")

# ---- auxiliaries and irregular verbs (all principal parts)
add("""
be am is are was were been being have has had having do does did done
doing say says said saying go goes went gone going get gets got gotten
getting make makes made making know knows knew known knowing think thinks
thought thinking take takes took taken taking see sees saw seen seeing
come comes came coming find finds found finding give gives gave given
giving tell tells told telling become becomes became becoming show shows
showed shown showing leave leaves left leaving feel feels felt feeling
put puts putting bring brings brought bringing begin begins began begun
beginning keep keeps kept keeping hold holds held holding write writes
wrote written writing stand stands stood standing hear hears heard
hearing let lets letting mean means meant meaning set sets setting meet
meets met meeting run runs ran running pay pays paid paying sit sits sat
sitting speak speaks spoke spoken speaking lie lies lay lain lying lead
leads led leading read reads reading grow grows grew grown growing lose
loses lost losing fall falls fell fallen falling send sends sent sending
build builds built building understand understands understood
understanding draw draws drew drawn drawing break breaks broke broken
breaking spend spends spent spending cut cuts cutting rise rises rose
risen rising drive drives drove driven driving buy buys bought buying
wear wears wore worn wearing choose chooses chose chosen choosing seek
seeks sought seeking throw throws threw thrown throwing catch catches
caught catching deal deals dealt dealing win wins won winning forget
forgets forgot forgotten forgetting lay lays laid laying fly flies flew
flown flying freeze freezes froze frozen freezing blow blows blew blown
blowing shine shines shone shining swing swings swung swinging spread
spreads spreading sweep sweeps swept sweeping strike strikes struck
striking arise arises arose arisen arising bind binds bound binding
shed sheds shedding split splits splitting
""")

# ---- regular verbs: stem expanded to s/ed/ing
REG_VERBS = """
accept access account achieve acquire act adapt add adjust advise affect
aggregate agree aid aim alert align allocate allow alter analyze announce
annotate append apply approach approve archive argue arrange arrive ask
assemble assess assign assist assume assure attach attempt attend attract
audit authorize automate average avoid await back balance base batch
behave believe belong benefit bias block boil bound broadcast buffer
bundle cache calculate calibrate call cancel capture care carry cause
center chain challenge change characterize charge check circulate cite
claim clarify classify clean clear click close cluster code collect
combine comment commit communicate compare compile complete comply
compose compress compute concern conclude condense configure confirm
connect consider consist consolidate constrain construct consume contain
continue contribute control convert cool coordinate copy correct
correlate correspond count cover crash create cross curate damage
debug decay decide declare decode decrease dedicate deduplicate define
degrade delay delegate delete deliver demonstrate denote depend deploy
deposit deprecate derive describe deserve design designate detail detect
determine develop deviate differ digitize diminish direct disable
discard discover discuss dispatch display dissipate dissolve distribute
document download drain drift drop dump duplicate edit effect embed
emerge emit emphasize employ enable encode encounter encourage end
enforce engage enhance ensure enter enumerate equal erode escape
establish estimate evaluate evaporate evolve examine exceed exchange
exclude execute exist expand expect expire explain explode explore
export expose express extend extract face fail fetch file fill filter
finish fix flag float flood flow fluctuate focus follow force forecast
form format fragment frame function gain gather generate govern grant
group guarantee guard guess guide handle happen harvest hash heat help
highlight host identify ignore illustrate imagine impact implement imply
import improve include incorporate increase index indicate infer inform
ingest inherit initialize inject insert inspect install instantiate
integrate intend interact intercept interest interpolate interpret
interrupt introduce invalidate investigate invoke involve isolate issue
iterate join judge jump justify label lack land last launch layer learn
license lift like limit link list live load locate lock log look loop
maintain manage manipulate map mark match materialize matter measure
melt mention merge migrate mirror miss mitigate mix model moderate
modify monitor mount move multiply name navigate need nest normalize
note notice notify number observe obtain occur offer open operate
optimize order organize orient originate output overlap override owe
own pack page parse partition pass patch pause perform persist pick
pin pipe pivot place plan plot point poll pollute populate position
post precipitate predict prefer prepare present preserve press prevent
print probe process produce profile project promote prompt propagate
propose protect prove provide provision publish pull purge push qualify
quantify query queue quote radiate rain raise randomize range rank rate
reach react receive recommend record recover reduce refer reference
refine reflect refresh refuse regard register regress relate release
rely remain remark remember remove rename render repair repartition
repeat replace replay replicate report represent reprocess request
require rescale research reserve reset reside resolve respond restart
restore restrict result resume retain retrieve return reuse reveal
reverse review revise rotate round route sample satisfy save scale scan
schedule scope score scrape search season secure seed seem select
separate serialize serve shape share shift ship sign signal simplify
simulate skew skip slice slow snapshot snow solve sort source span
spawn specify spell spill stage stamp start state stem step stop store
strengthen stream stress stretch structure study submit subscribe subtract succeed
suffer suggest summarize supply support suppose surge surround survey
suspend sustain switch sync synchronize synthesize tag tail talk target
test thank threaten throttle tile tilt time tokenize tolerate touch
trace track train transfer transform translate transmit travel traverse
treat trend trigger trim truncate trust try tune turn type unify update
upgrade upload use validate value vary vectorize verify version view
visit visualize wait walk want warm warn wash watch weigh weight
whitelist wish wonder work wrap yield zoom
"""

VOWELS = set('aeiou')

# multisyllable stems whose final consonant doubles (stress-dependent in
# English, so enumerated rather than guessed)
DOUBLING = {
    'commit', 'refer', 'prefer', 'submit', 'transmit', 'permit', 'omit',
    'format', 'regret', 'control', 'patrol', 'equip', 'occur', 'transfer',
    'admit', 'forbid', 'label',
}


def doubles(stem):
    if len(stem) < 3:
        return False
    cvc = (stem[-1] not in VOWELS and stem[-1] not in 'wxy' and
           stem[-2] in VOWELS and stem[-3] not in VOWELS)
    return cvc and (len(stem) <= 4 or stem in DOUBLING)


def verb_forms(stem):
    out = {stem}
    if stem.endswith(('s', 'x', 'z', 'ch', 'sh')):
        out.add(stem + 'es')
    elif stem.endswith('y') and stem[-2] not in VOWELS:
        out.add(stem[:-1] + 'ies')
    else:
        out.add(stem + 's')
    if stem.endswith('e') and not stem.endswith(('ee', 'ye', 'oe')):
        out.add(stem[:-1] + 'ed')
        out.add(stem[:-1] + 'ing')
    elif stem.endswith('y') and stem[-2] not in VOWELS:
        out.add(stem[:-1] + 'ied')
        out.add(stem + 'ing')
    elif doubles(stem):
        out.add(stem + stem[-1] + 'ed')
        out.add(stem + stem[-1] + 'ing')
    else:
        out.add(stem + 'ed')
        out.add(stem + 'ing')
    return out


for v in re.split(r'\s+', REG_VERBS.strip()):
    for f in verb_forms(v):
        words.add(f)

# ---- nouns: stem expanded with a regular plural
NOUNS = """
ability absence abstraction accumulation access accessibility accident accuracy acid
acronym action activity actor adaptation addition address adjustment
administrator advance advantage advice agency agenda agent aggregation
agreement air airport alarm alert algorithm alias alignment allocation
altitude amount analysis analyst analytics anomaly answer antenna
apparatus appendix application approach approval april architecture
archive area argument arrangement array arrival article artifact aspect
assembly assessment asset assignment assimilation assistance assumption
atlas atmosphere attachment attempt attention attribute audience audit
august author authority authorization automation autumn availability
average aviation axis backend background backup balance balloon band
bandwidth bank bar barometer base baseline basin basis batch battery
beach bearing behavior benchmark benefit bias bin binary bit blizzard
block blog board body book boolean border boundary box branch breeze
bridge brightness broker bucket budget buffer bug building bulletin buoy
bureau bus business byte cache calculation calendar calibration call
camera campaign canal candidate capability capacity capital caption
carbon card case catalog catalogue category ceiling cell census center
centre century certificate chain challenge champion change channel
chapter character characteristic chart check checklist checkpoint
checksum chemistry choice circle circuit circulation citation city
claim class classification classifier click client climate climatology
cloud cluster coast coastline code codebase codec collection college
column combination command comment commission commitment committee
communication community comparison compiler complexity compliance
component composition compression computation computer concentration
concept concern conclusion condensation condition conference confidence
configuration confirmation conflict connection consensus consequence
consistency console constant constraint construction consumer contact
container content context continent contract contrast contribution
control controller convection convention conversation conversion
converter cooperation coordinate coordination copy core corner
correction correlation cost country county couple course court coverage
crash credential credit crest crisis criterion crop cross cryosphere
culture currency current curve customer cyclone dam damage dashboard
data database dataset date datetime day daylight deadline debate debug
decade december decision declaration decline decoder decomposition
decrease default defect definition degree delay delegate deletion
delivery delta demand demonstration density department departure
dependency deployment deposit depression depth deputy description
design designer desk destination detail detection detector developer
development deviation device dew diagram dialog dictionary difference
digest digit dimension direction directive directory disadvantage
disaster discipline discovery discussion disk dispatch display distance
distribution district divergence diversity division document
documentation domain downtime draft drain drift driver drizzle drought
duration dust duty earth earthquake east economy edge edition editor
education effect efficiency effort election electricity element
elevation email emergency emission employee employer encoder encoding
end endpoint energy engine engineer engineering enterprise entity entry
environment equation equator equipment equivalent error estimate
estimation evaluation evaporation evening event evidence evolution
exam example exception exchange execution executive exercise existence
exit expansion expectation experience experiment expert expiration
explanation explorer export exposure expression extension extent
extraction extreme eye facility fact factor factory failure fall
family farm farmer feature february feedback fellow fence fetch field
figure file filter finance finding firm fix flag fleet flexibility
flight flood floor flow fluid focus fog fold folder followup font
footprint force forecast forecaster forest form format formation
formula forum foundation fragment frame framework freeze frequency
friction friday front frontend frost function fund future gain gale
gap garden gas gate gateway gauge generation generator glacier glossary
goal government gradient grant granularity graph graphic grass gravity
grid ground group growth guard guidance guide guideline gulf gust habit
hail half hall handler hardware harvest hash hazard haze head header
headline headquarters health heat heatwave hectare height hemisphere
heuristic hierarchy highlight hill hint histogram history holiday home
horizon hospital host hour house humidity hurricane hydrology hypothesis
ice iceberg icon idea identification identifier identity image impact
implementation import improvement incident increase increment index
indicator individual industry inference information infrastructure
ingestion initiative input insight inspection inspector instability
installation instance institute institution instruction instrument
integer integration integrity intensity intent interaction interface
interior internet interpolation interpretation interval introduction
inventory investigation investment invitation invocation island isobar
isotope issue item iteration january job join journal journey july
june jurisdiction kernel key keyboard keyword kilometer kind kingdom
kit knot knowledge lab label laboratory lake land landscape language
laptop latency latitude launch law lawyer layer layout leader
leadership league lookup league level library license lifecycle
lifetime lightning limit limitation line lineage link list listener
listing literature load loader location lock log logic login longitude
loop loss lot machine magnitude mail mainframe maintenance majority
manager mandate manifest manner manual manufacturer map mapping march
margin marine mark market marker mask mass master match material
matrix matter maximum may mayor mean meaning measure measurement mechanism
media median medicine meeting member membership memo memory mention menu
merge mesh message metadata meteorology meteorologist meter method
methodology metric microservice midnight migration mile milestone
military millimeter million mind minimum minister minority minute
mirror mission mist mistake mixture mode model moderator modification
module moisture moment monday money monitor monitoring monsoon month
monument moon morning motion mountain mouse movement multiplier museum
music name nation nature navigation necessity need neighborhood nest
network news newsletter night nitrogen node noise noon norm normal
north notation note notebook notice notification notion noun november
nowcast number object objective obligation observation observatory
observer occasion occurrence ocean oceanography october offer office
officer offset oil operation operator opinion opportunity option orbit
order organisation organization orientation origin original outage
outcome outlier outlook output oven overflow overhead overview owner
ownership oxygen ozone pace pack package packet page pair pan panel
paper paragraph parallelism parameter parcel parent park parser part
participant particle particulate partition partner partnership party
pass passage password past patch path pattern pause payload payment
peak peer penalty pension percent percentage percentile performance
period permafrost permission person personnel perspective phase phone
photo photograph phrase physics picture piece pilot pipeline pixel
place plain plan plane planet planner planning plant plate plateau
platform player plot plugin pocket point pointer policy pollutant
pollution pond pool population port portal portion position possibility
post potential power practice precipitation precision prediction
predictor preference prefix presence presentation president pressure
preview price principle print printer priority privacy privilege
probability probe problem procedure process processing processor
producer product production profession professional professor profile
program programmer progress project projection promise promotion prompt
proof property proportion proposal protection protocol prototype
province provision proxy publication pull purpose push quality quantity
quarter query question queue quota radar radiation radius rain
rainfall ramp range rank ranking rate ratio reader reading reality
reason rebuild receipt receiver reception recipe recipient recognition
recommendation record recovery reduction redundancy reference refresh
refusal region register registration registry regression regulation
rejection relation relationship release relevance reliability relief
religion reminder removal repair repartition replacement replica
replication reply report repository representation representative
reproduction republic request requirement research researcher reserve
reservoir reset residence resident resolution resource response
responsibility rest restart restaurant restriction result resume
retention retirement retrieval retry return reuse revenue review
reviewer revision reward ridge right rigor ring risk river road
roadmap rock role rollback rollout rollup room root rotation round
route router routine row rule run runoff runtime runway safety salary
salinity salt sample sampling sand satellite saturation saturday
scale scan scanner scenario schedule schema scheme school science
scientist scope score screen screenshot script sea search season seat
second secret secretary section sector security sediment seed segment
selection semantics semester seminar senate senator sensitivity sensor
sentence september sequence series server service session set setting
settlement setup shape shard share sheet shelf shell shelter shift
ship shore shortage shortcut shoulder shower side sight sign signal
signature significance similarity simulation singer sink site situation
size sketch skill sky sleet slice slide slope smoke snapshot snow
snowfall snowpack society socket software soil solution sort source
south space span spark speaker specialist species specification
spectrum speech speed spell spelling sphere spike spill spiral spring
sprint squall square stability stack staff stage stakeholder standard
star start state statement station statistic status steam step stock
storage store storm story strategy stream street strength stress
stretch strike string structure student studio study style subject
submission subscription subset substance substring suburb success
suffix suggestion suite sum summary summer summit sun sunday sunlight
sunrise sunset sunshine supplement supplier supply support surface
surge surplus survey survivor suspension swamp swap symbol symptom sync
syntax synthesis system table tag tail talk tank target task taxonomy
team technique technology telescope television temperature template
tenant tendency tension term terminal territory test text texture
theme theory thing threshold thread threat thunder thunderstorm
thursday ticket tide tier time timeline timeout timestamp timezone
title token tolerance tool toolkit top topic topography tornado total
touch tour town trace track trade tradition traffic trail train
training trait transaction transcript transfer transformation
transition translation transmission transport trend trial triangle
tribe trigger trip tropopause trough truck trust truth tuesday tunnel
tuple turbine turbulence turn type typhoon uncertainty underflow
understanding union unit universe university update upgrade upload
uptake uptime usage use user utility vacation validation validator
valley value valve vapor vapour variable variance variant variation
vector vegetation vehicle velocity vendor verification version vessel
veteran victory video view viewer village violation visibility vision
visit visitor visualization volcano volume vortex vote wake
walk wall warehouse warming warning watch water watershed wave way
weakness wealth weather web webinar website wednesday week weekend
weight west wetland wheel whirlwind wildfire wind window winner winter
wire wisdom word work worker workflow workload workshop workstation
world writer yard year zone
"""


def plural(stem):
    if stem.endswith(('s', 'x', 'z', 'ch', 'sh')):
        return stem + 'es'
    if stem.endswith('y') and stem[-2] not in VOWELS:
        return stem[:-1] + 'ies'
    if stem.endswith('o') and stem[-2] not in VOWELS and stem not in (
            'photo', 'memo', 'kilo', 'logo', 'piano', 'radio', 'zero'):
        return stem + 'es'
    return stem + 's'


NO_PLURAL = {
    'physics', 'analytics', 'mathematics', 'news', 'headquarters',
    'personnel', 'information', 'knowledge', 'wisdom', 'weather',
    'meteorology', 'climatology', 'hydrology', 'oceanography',
    'semantics', 'statistics', 'evidence', 'equipment', 'software',
    'hardware', 'moisture', 'precipitation', 'turbulence', 'guidance',
    'permafrost', 'health', 'wealth', 'sunshine', 'sunlight', 'daylight',
}
for n in re.split(r'\s+', NOUNS.strip()):
    words.add(n)
    if n not in NO_PLURAL:
        words.add(plural(n))

# ---- irregular plurals and -is/-on/-um latinates
add("""
man men woman women child children person people foot feet tooth teeth
mouse mice goose geese datum data criterion criteria phenomenon
phenomena analysis analyses basis bases crisis crises hypothesis
hypotheses thesis theses axis axes matrix matrices index indices
appendix appendices vertex vertices radius radii medium media series
species aircraft sheep fish deer staff stratum strata maximum maxima
minimum minima spectrum spectra curriculum curricula life lives half
halves leaf leaves shelf shelves knife knives wife wives self selves
""")

# ---- adjectives (+ -ly adverbs for clean regulars)
ADJ = """
able absolute abstract accurate active actual additional adequate
administrative advanced adverse aggregate alternate alternative ambient
annual anonymous apparent appropriate approximate arbitrary arctic
arid artificial asynchronous atmospheric atomic automatic available
average aware bad bare basic big binary bitter black blue brief bright
broad brown calm capable central certain cheap chemical chief civil
classic clean clear climatic close cloudy coastal cold collective
colonial common compact comparable complete complex comprehensive
computational concrete concurrent conditional confident consistent
constant contemporary continental continuous conventional cool
corporate correct corrupt critical cultural cumulative current custom
daily dangerous dark dead declarative deep default defective degraded
deliberate dense dependent deprecated deterministic different difficult
digital direct dirty distinct distributed diverse domestic dominant dry
dual due duplicate durable dynamic early eastern easy economic
effective efficient elastic electric electrical electronic elegant
empirical empty enormous entire environmental equal equatorial
equivalent essential eventual exact excellent exceptional excessive
exclusive executive exempt existing expensive experimental expert
explicit express extensive external extra extreme fair fairly false
familiar famous fast fatal favorable federal final financial fine firm
first fiscal fixed flat flexible fluid foggy foreign formal fortunate
forward free frequent fresh front frozen full functional fundamental
future general generic genuine geographic geographical geospatial
glacial global gold good gradual grand graphical gray great green
gross happy hard heavy hierarchical high historic historical holistic
horizontal hot hourly huge human humid hybrid hydrological ideal
identical idle immediate immutable implicit important inbound
inclusive incremental independent individual industrial inevitable
initial inner innovative instant institutional integral intense
intensive interactive interim intermediate intermittent internal
international invalid isolated joint judicial junior key large last
late latent lateral lazy leading legacy legal light likely limited
linear liquid literal little live local logical long loose low lower
loyal main major manual marginal marine maritime massive material
mature maximum mean mechanical medical medium mental meteorological
metric mid middle mild military minimal minimum minor missing mixed
mobile moderate modern modest modular moist molecular monthly moral
multiple municipal mutual narrow national native natural nearby
necessary negative nervous neutral new next nice nightly noisy nominal
normal northern notable novel nuclear null numeric numerical objective
obvious occasional odd official old open operational opposite optical
optimal optional oral orbital ordinary organic original other outbound
outdoor outer overall overcast parallel partial particular passive past
patient peak perfect periodic permanent persistent personal physical
plain planetary plural polar political poor popular portable positive
possible potential powerful practical precise predictable preliminary
present previous primary prime principal prior private probable
procedural productive professional prominent prone proper proportional
protective proud public pure purple quarterly quick quiet random rapid
rare raw ready real realistic reasonable recent recursive red redundant
regional regular relative relevant reliable remote renewable repeated
representative reproducible residential residual resilient responsible
rich rigid robust rough round routine royal rural safe salient scarce
scientific seasonal secondary secure selective semantic senior
sensitive separate sequential serial serious severe shallow sharp
short significant silent silver similar simple single skilled slight
slow small smart smooth social soft solar solid southern sparse
spatial special specific spectral stable standard static statistical
steady steep sticky still stormy strategic strict strong structural
subsequent substantial subtle successful sudden sufficient suitable
sunny super supplementary sustainable symbolic synchronous synthetic
systematic tabular tall technical temporal temporary tentative terrible
tertiary thermal thick thin thorough tidal tight tiny top total tough
toxic traditional transient transparent tropical true typical ultimate
unavailable uniform unique universal unknown unlikely unstable upper
urban urgent useful usual vacant valid valuable variable various vast
verbose vertical viable violent virtual visible visual vital volatile
voluntary warm weak wealthy weekly western wet white wide wild willing
windy wise wooden wrong yellow young zonal
"""
for a in re.split(r'\s+', ADJ.strip()):
    words.add(a)
    if a.endswith('y') and a[-2] not in VOWELS:
        words.add(a[:-1] + 'ily')
    elif a.endswith('ic'):
        words.add(a + 'ally')
    elif not a.endswith('ly'):
        words.add(a + 'ly')

# ---- numbers, ordinals, units, misc
add("""
zero one two three four five six seven eight nine ten eleven twelve
thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty
thirty forty fifty sixty seventy eighty ninety hundred thousand million
billion trillion first second third fourth fifth sixth seventh eighth
ninth tenth celsius fahrenheit kelvin pascal hectopascal millibar knots
meters metres kilometers kilometres centimeters millimeters inches feet
miles hectares litres liters grams kilograms tonnes seconds minutes
hours days weeks months years hertz watt watts joule joules newton
degrees percent utc gmt am pm etc via versus vice versa
""")

# ---- geography, organizations, technology proper-ish nouns (lowercased
# tokens that appear in meteorological metadata text)
add("""
africa america american antarctic antarctica arctic asia asian atlantic
australia australian austria belgium brazil brazilian britain british
canada canadian caribbean china chinese denmark dutch egypt england
english europe european finland france french german germany greece
greek iceland india indian indonesia ireland irish israel italian
italy japan japanese kenya korea korean mediterranean mexican mexico
morocco netherlands norway norwegian pacific poland polish portugal
portuguese russia russian scandinavia scotland spain spanish sweden
swedish switzerland swiss thailand turkey ukraine states kingdom
wales washington london paris berlin tokyo beijing moscow geneva
ottawa toronto montreal quebec ontario alberta manitoba saskatchewan
columbia scotia brunswick newfoundland labrador yukon nunavut provinces
territories wmo wis unesco nato unicode ascii json xml yaml csv html
http https url urls uri uris api apis sql parquet iceberg spark
hadoop kafka linux unix java scala python github gitlab git docker
kubernetes arrow pandas internet intranet email online offline website
webpage metadata dataset datasets realtime nowcasting reanalysis
ensemble ensembles synop temp climat metar speci taf bufr grib netcdf
geotiff wgs84 epsg oscar mqtt amqp broker topic subtopic pubsub
observations observation forecasts analyses
""")

words.discard('wether')  # see module docstring

existing = set()
try:
    with open(OUT) as fh:
        existing = {w.strip().lower() for w in fh if w.strip()}
except FileNotFoundError:
    pass
merged = sorted(words | existing)
with open(OUT, 'w') as fh:
    fh.write('\n'.join(merged) + '\n')
print(f'wrote {len(merged)} words ({len(existing)} pre-existing kept)')
