"""Vendor a fuller name→gender snapshot (VERDICT r7 item 2).

Regenerates ``resources/gender_names.csv`` so that EVERY first name
appearing >= MIN_COUNT times (default 3 since r9; was 5 in r8) in the
reference dataset's personnel table is an explicit, reviewable
decision:

  - ``male`` / ``female``  — from the curated public-knowledge map
    below (common given names and their predominant gender across the
    public name lists the gender_guesser nam_dict itself derives from:
    US SSA-style frequency lists, common European/Indian/Arabic/East
    Asian given names);
  - ``unknown``            — EITHER a deliberately-androgynous name
    (the ``_ANDY`` set: kim/alex/jordan/… — the nam_dict 'andy' fold,
    ``task.py:47-49``) OR a token that is not a gendered given name at
    all (East Asian surname-first tokens, initials like 'j.'), OR a
    name the curator declined to label. All three land in the same
    ``unknown`` bucket the reference produces for them.

Snapshot discipline (functions/gender.py): the CSV stays the canonical
HERMETIC source — THIS tool is how it is refreshed, and the diff is
reviewable name-by-name. ``tools/refresh_gender_snapshot.py`` derives
the exact-nam_dict table when that lib is installable, but writes it
to a SCRATCH path by default (overwriting the curated snapshot would
revert curated names/relabels and break the golden-label tests —
reconcile its printed diff into the lists below instead).

Run:  python tools/vendor_gender_names.py [--min-count 3] [--dry-run]
"""

from __future__ import annotations

import argparse
import csv
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SNAPSHOT = (
    REPO / "data_engineer_task_spark" / "resources" / "gender_names.csv"
)

# ---------------------------------------------------------------------------
# Curated labels for names observed >=5 times in the dataset that the
# 544-name r1 snapshot did not cover. male/female = confident
# predominant gender; _ANDY = deliberately unknown (androgynous or
# non-given-name token). Anything observed but in none of these sets
# is written as unknown too — the difference is only documentation.
# ---------------------------------------------------------------------------

_MALE = """
abdullah abel abhishek adel aditya adnan adriano adrián ahmad ahmed
ahmet ajay akira akshay al
alain alberto alden aleksandr aleksey alejandro alessandro alessio
alexandre alfonso ali allan allen amin amir amit aman amr anand anant
anders andre andreas andrzej andré andrés andy angel angus anil anton
antoine archie ari arjun armando art arturo arun ashish ashok ashraf
ashwin atsushi atul august avinash beau ben benny benoît bharat björn
blake boris brady brendan brent bruno bryce burak byron cal camilo
carlo cem charlie chetan chris christoph christophe chuck clark
claudio clay
clint clive cody cole connor conor conrad cory césar daisuke damian
damien damon daniele danish dante darin darío deepak denis desmond
devin
dilip dillon dinesh dino dion donny dorian doug duncan ed eli elliot
emilio emmanuel emre enzo ernie esteban fabian fabio fabrizio fabián
federico felipe finn florian franck franco francesco freddie freddy
françois fábio gabe ganesh gareth garrett garry gaurav gautam gavin
geoff
geoffrey georges gerard gerardo gerry giorgio gil gilles giovanni
girish gonzalo graham grant gregg griffin guilherme guillaume
guillermo gustavo guy gérard hakan hal hani hank hans hany hari
harrison hasan hassan hernán hiroshi hiroyuki hugo hunter hussein
héctor iain ibrahim ignacio igor imran ira isaiah iván jacek jackson
jacques jaime jake jakob jamal jan jean-claude jeremiah jermaine
jerzy jesús jitendra joaquín joey johan johannes jonah jonas jonny
joonas jordi josh José joão jude julien julio julius julián kabir
kai kamal karan karim kazuya ken kenji kenny kentaro ketan khaled
khalid kirill kishore koichi koji krishna krzysztof kunal lachlan
lars laurent leandro lenny leonardo liam lionel logan lorenzo luc
luca luciano lukas maciej mads mahesh mahmoud malcolm malik manish
manny manoj marcel marcelo marco marcos marek mariano mario mark
martín mason massimo matheus matias matt matteo matthias matías
mauricio maximilian maxwell mehmet mert metin micah michel michał
mick mickey miguel miles milind milo mitch mohamed mohammad mohammed
mohan mohit morten mostafa muhammad mukesh murat mustafa
nacho nate nelson nick nico nicolas nicolás nigel nikhil noel nolan
omar
onur orlando osman otto owen pablo paco paolo pascal patricio paulo
pavel pawan pepe pete phil philippe pierre piotr pradeep prakash
prasad prashant prem quincy rafael rafał rahul raj raja rajeev rajesh
rajiv rakesh ram ramesh ramón raphael raúl ravi reggie renato rene
rhys riccardo rich richie rico rob robbie rod rodrigo rohan rohit
roman rory rubén rupert ryo ryu sachin saeed sahil said sal salah
salman sameer sami samir sandeep sanjay sanjeev santiago satish
saurabh sebastian sebastián serdar shaun shawn sherif shinji
siddharth sonny spencer stefan stefano stig stéphane sudhir suhas
sumeet sunil suresh sébastien takahiro takashi takeshi takuya tamer
tarek tarun teddy terence theo thierry thom tobias toby tolga tomasz
tomás toru toshiyuki trey tsuyoshi ty umesh umut vaibhav varun vic
vicente victor vijay vikas vikram vinay vince vincenzo vinod vishal
vivek vladimir víctor wes will willie wilson wojciech xavier yasser
yousef youssef yusuf zach zack zain zak álex álvaro óscar
""".split()

_FEMALE = """
abby abeer ada aditi adriana adrienne aida alba alejandra alessandra
alexa alexia alina alison allie alma alyssa amrita ana angelina angie
anjali annabelle antonia aparna ariana asha ashleigh aurora ava aya
ayesha ayten ayça bea belén bella bianca billie blanca brianna
brianne bridget brigitte britt brooke bruna burcu bárbara caitlin
camila camilla camille cara carolina cassandra celeste celia chelsea
chika ciara claudine cleo courtney cristina daisy daniela daniella
daphne dina divya dolly eliza elisa elisabeth ellie elsa elvira
emilie eri erika eve ewa fanny farah fatima fernanda fiona florencia
francesca gabriela gabrielle gemma georgina gillian giovanna giselle
giulia greta hala haley hana hanna harriet haruka hayley helena hope
ingrid isabella isabelle isha itziar ivana jade jasmine jen jenna
jessie joanna johanna joséphine joy juliana julieta juliet juliette
junko jyoti kaitlyn kana kaori karina karla kat katarzyna kate
katrina katy kay kiki kirsten kristina laila lakshmi lana lara
larissa laura lea leila lena lexi lili lily lina lindsay lindsey liz
liza lola lorena lorna lucia lucía luisa luna lynn maría
maddie madeleine madeline magdalena maggie mai maite mandy manuela
marcela margarita margot mari mariam mariana marianne marina
marisa marissa marta martina mayumi maya megumi meera melinda
mercedes mia michaela miranda mimi mina mona monika monique mónica
nabila nadia nadine natalia natasha nathalie neha nia nikki noriko
olga paige pallavi paola pascale paulina pilar polly pooja poonam
priya priyanka rachael rania raquel reem renée rie rina robyn rosie
sabina sabrina sadie salma sana saskia sayaka seema sharifah shelley
sheryl shivani shreya shruti shweta sierra silvia simran siobhan
smita sneha sofia sofía sonal sonja sonya sophie summer supriya
susana susanne svetlana tania tia usha valeria veena verónica vidya
yasmin yoko yui yuka yuko zara zeynep zoe zoë
""".split()

# Deliberate 'andy' fold (task.py:47-49): androgynous given names, or
# tokens the first-space split produces that are not gendered given
# names (East Asian surname-first, initials/titles). Kept as an
# explicit list so snapshot regeneration records the DECISION, not an
# accident of coverage.
_ANDY = """
ahn ai alaa alex alexis apoorva ariel aubrey ayo bae bailey blair bo
casey cha chang chi cho choi coco cooper dakota dana dani dara dee
deep deng deniz devon dj dominique dong drew el fan femi feng frankie
gao go gong guo han happy hayden hikaru he hilary hong hu huang hwang
iman indra jackie jacky jamie jang jean jeon jeong jess ji jiang jin
jo jordan jun jung kang kaya kelly kerry kim kiran kiko ko kris kwon
lai lam laurence lee lesley leslie liang lim lin liu lou lu ma
mackenzie manu
marion mel miki mika mo moon morgan nam nana nat nicky nicola nikita
noor
nour oh paris park parker pat peyton quinn rana riley robin sacha
sandy sasha seo shannon shen shim shin simone song stacy sterling su
sultan suman sun sung sydney sunny t.j. tan taylor terry tracey tracy
vicky wang wei wong wu xu yang yao yi yin yoo yoon yu yuan yuen yuki
yuri zhang zhao zhou zhu dr. j. j.d. k. m. r.
""".split()

# ---------------------------------------------------------------------------
# r9 widening (VERDICT r8 item 5): curated labels for names observed
# 3-4 times in the dataset (the census threshold dropped from 5 to 3).
# Same discipline as the >=5 blocks above; names observed at >=3 that
# appear in NONE of these lists are written as 'unknown' by the
# observed-names sweep — the documented "curator declined" bucket.
# ---------------------------------------------------------------------------

_MALE += """
aakash aamir abbas abdel abdul abdulaziz abhay abhijit abhinav abraham
adan adarsh adeel adrien agustín aiden aitor akash aksel alastair
alban aldo alec aleksandar alistair alok alphonso alvin amar amol
anand andrei andres anish ankit ankush anoop anson antony anupam
anurag arash arie arman armand armin arnold artur arvind ashutosh
asif asim augusto aurélien axel ayman ayumu aziz baron barış bassam
bassel benedict benjamín bernie bert bertrand bhushan bikram bilal
brennan buddy burt bülent caio callan callum calum caner carter cary
celso cengiz cesar chandan chase chinmay ciarán clayton cliff colby
colton corbin cyril cyrus daiki dane danilo darius darshan daryl
declan deon dermot dev deven dhruv dick didier dieter dileep dimas
dimitri dirk donnie donovan doron dragan dwayne dwight eddy edison
edmond edmund edoardo ege elias elijah elvis emil emiliano emir
emmett emrah engin enrico erdal erick ernesto erol eugen evgeniy ezra
ezzat fabien fahad faisal farhan faris filippo fionn flavio fouad
frédéric félix gabriele gagan gaspard gastón germán giacomo giancarlo
gideon giles gino giulio gopal goran goro grégoire gunnar guru habib
hadi hakim hamdi hamdy hamish hamza harald harish harsh hayato hemant
henrik herb hesham himanshu hiro hiroaki hiroki hisham hitesh
hrishikesh hubert humberto hussain ibrahima ismail israel issei iñaki
iñigo i̇lker jai jairo janusz jasper javed jayden jayson jed
jean-michel jean-pierre jiro joachim josep josiah judah junichi
junior jérémie jérôme józef kane kapil karsten karthik kasper
kazuhiro kazuki kedar keegan keenan keiichi kelvin kenan kengo kenn
kent khalil kieran kohei konstantin kotaro kristian kubilay kumar
kunle kushal kıvanç lalit landon lautaro levent levi lew louie lucien
luka magnus maher mahmood majed majid makarand makoto mamoru manav
mangesh manolo marcello mariusz markus marlon marty marwan masashi
masato massimiliano mat mateusz mathias mauro mayur mehdi meshal
michaël mikael mikey mikhail milan miquel mitsuru mohd mohsen monty
moses moshe mukul myles nabil naoto narendra nasser nathanael naveen
navin neal ned neeraj nestor niall nik niko nikolai nikolaj nils
nishant nobuyuki norm néstor okan olaf olly om omari osama osvaldo
ozan pankaj paras paresh partho patrik pau pep pierce pierfrancesco
pietro philipp pramod pranav pratap praveen preston puneet pushkar
quentin raghav rajat rajendra rajkumar rami ramiro ranjit rashid reda
rehan remo rené rex ric rishi rocky rodger rodolfo rolf romain ronny
rudy rufus rusty ryohei ryosuke ryota sagar salim salvatore sammy
samrat santosh satoshi satya saul sayed seann serkan sergi shabbir
sharad shashank sherman shigeru shiva shivam sho shubham shunsuke sid
sibusiso silvio sinan sohail sooraj spike stan stephan stijn
sudhanshu sumit suraj surya sushant sven syed sylvain sylvester
søren taher takayuki talal tanner tanuj tarik tariq taro taron tarık
tenzing teo tetsu tetsuya thiago thor théo timo tito titus tomas
tomer tommaso tomohiro tomoyuki trent tristan tucker tunde tushar
tyrone udo ulrich valentin venkatesh viktor vineeth vipin vishnu vlad
volker wade wael wagner wale waleed wallace wally werner wil willy
wolfgang wyatt yann yoshiyuki yosuke yuichi yuji yutaka yuto yves zac
zafer zakariya zayed zoltán éric
""".split()

_FEMALE += """
aarti abril adelaide adrianna adèle agnieszka agustina aimee
aishwarya alana alexandria alia alisha alka ally alycia alyson amal
amalia america amruta amrutha ananya anastasia angelica angeline
angélica anisa anjana anju annabel antoinette anu anushka anya
archana aria ashlyn asia aslı asmaa asuka ayaka ayu ayumi beatriz
bebe becky begüm belinda berta bethany betsy bhavani blanche briana
callie candace candela candice cansu carly carmina catalina cate
celina celine chandini charity charmaine cherry chiara chie chioma
christiane christy clare clotilde constanza consuelo corinne danica
daria debbie deepali deepika deepti deirdre demet demi derya desiree
devika devyani disha diya drea dulce eiko elise elle elsie emi
emmanuelle emmy esha esra estelle eugenia fabiana fabiola fatma faye
felicia felicity fleur freya gabby gabriella gauri geeta gia gwyneth
géraldine hanan hande heba hema hind hisako hiyori huda hülya hélène
ijeoma iliana ilse imani imelda imogen ina inas india indira inge
inma irina ishita isis ivy i̇pek janel janelle jasmin jayne jazmyn
jemima jemma jenn jillian jimena jocelyn jodi joelle jordana juana
julianne júlia kajal kali kanako kara kari karolina katarina
katharine kathrine katia katrin keiko kelli kelsey kemi kiana
kimberley kimmy komal kristine kriti kritika krystal kyla kylie kyoko
kyra laurel leanne leela leticia lidia liliana lilly lise liv lizzie
luciana lucie lulu luz lynne lynsey léa macarena madhavi madhuri
madoka maeve magda maha maia maisie maja majo mala malaika malena
mallika mami manju margherita marguerite maribel maris marisol
mariya marla marlene maryam masako mathilde may mayra małgorzata
meagan meenakshi meg meghan meghna mei melina melis melisa melody
meltem meral mercy meredith mikaela mikako millie minami mindy mira
mireia mireille miu miyu montse montserrat myra myriam mélanie nada
nandita naoko natsumi naya nidhi nika nita nur nuria padma paloma
pam parvathy parveen patti penelope peta petra pia piper pippa
preeti priscila priscilla puteri radha radhika rajeshwari ramona
ramya randa rasika ratna reba reema reina rena renata rhea ria richa
riham rima risa ritu riya rochelle rocío romina roopa rosamund
rosanna roxanne ruhi rupa saki sakshi samira sammi samyuktha sandi
sanya saori sapna sari sarika satomi savannah savita scarlet seda
seiko selen selma serena shakira shalini shanna shauna shazia
shefali shelby shilpa shiori shriya shubhangi sian sienna sigrid
simi simona skye so-yeon suchitra sujata sumire susie swati sylvie
sílvia takako talia tamar tamsin tanvi teri tess tessa tilda tomoko
tori traci tricia trisha tyra urmila ursula vandana virginie wakana
whitney ximena yael yara yasmine yoriko yoshiko yvette zoey zofia
zoya ángela özge özlem
""".split()

_ANDY += """
a. addison adi aj aki alexx amrit anindya anjum aoi arya ash ashton
ashwini asri avery b. b.j. baek bela bimbo bin bing brit brooklyn
byun cai carey cassidy chai chance chandra cheng chew chiaki chin
chu chun chung cris d.b. dai dallas dany darby dayo dewi dian didi
eden fran fu gaby georgie gim grey gulshan gurpreet ha hai harsha
hou hsia hsieh hyun im ini izzy j.c. j.j. jaden jani jet ji-won jody
jojo ju juri k.c. kader kaoru karol kei king kirby kit kranti ku
kuang kuo kwok la lan lane lau lei leigh leung lex lil lo lung luo
lyric lü mac manpreet mar master min ming minori mir misha moe
montana mrunal mu na nao natsuki navneet ng ni nic ola p.j. pj qi qu
reese remy ren rio rip rj roshan rowan rumi sai samar sani scottie
seun seyi shadi shakti shan shao shashi sheng shi shree sky skylar
so sol soma sonam sora stevie storm sura taiwo tate tatum tian tien
ting tj tomiwa tomo tope tory tosin toyin tuna um v. van w. wai wen
woo xiao yan yayo ye yen yeo yim yo yong yun zheng şafak
""".split()

_MALE = [n.lower() for n in _MALE]


def observed_names(min_count: int) -> dict[str, int]:
    """Distinct lowercase first names with >= min_count personnel
    rows, from the real pipeline output (the same table Q3-Q5/Q10
    read)."""
    sys.path.insert(0, str(REPO))
    from pyspark.sql import functions as F

    from data_engineer_task_spark.plans.netflix import NetflixPipeline
    from data_engineer_task_spark.session import get_spark

    spark = get_spark("vendor-gender", cpus=8)
    pipe = NetflixPipeline(spark, tempfile.mkdtemp())
    pipe.run(str(REPO.parent / "reference" / "netflix_titles.csv"))
    rows = (
        pipe.table("personnel")
        .groupBy(F.lower("first_name").alias("k"))
        .count()
        .where(F.col("count") >= min_count)
        .collect()
    )
    return {r["k"]: r["count"] for r in rows}


def build(min_count: int) -> tuple[dict[str, str], list[str]]:
    male = {n.lower() for n in _MALE}
    female = {n.lower() for n in _FEMALE}
    andy = {n.lower() for n in _ANDY}
    both = male & female
    if both:
        raise SystemExit(f"names in BOTH male and female sets: {sorted(both)}")
    overlap = (male | female) & andy
    if overlap:
        raise SystemExit(f"names in both gendered and andy sets: {sorted(overlap)}")

    existing: dict[str, str] = {}
    with open(SNAPSHOT, newline="") as f:
        for row in csv.DictReader(f):
            existing[row["name_key"].lower()] = row["gender"]

    merged = dict(existing)
    conflicts = []
    curated = (
        {n: "male" for n in male}
        | {n: "female" for n in female}
        | {n: "unknown" for n in andy}
    )
    for name, g in curated.items():
        if name in merged and merged[name] != g:
            conflicts.append(f"{name}: snapshot={merged[name]} curated={g}")
        merged[name] = g

    for name in observed_names(min_count):
        merged.setdefault(name, "unknown")
    return merged, conflicts


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-count", type=int, default=3)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    merged, conflicts = build(args.min_count)
    for c in conflicts:
        print("RELABELED", c)
    by = {"male": 0, "female": 0, "unknown": 0}
    for g in merged.values():
        by[g] += 1
    print(f"snapshot: {len(merged)} names {by}")
    if args.dry_run:
        return 0
    with open(SNAPSHOT, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["name_key", "gender"])
        for name in sorted(merged):
            w.writerow([name, merged[name]])
    print(f"wrote {SNAPSHOT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
