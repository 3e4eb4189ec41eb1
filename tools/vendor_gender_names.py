"""Vendor a fuller name→gender snapshot (VERDICT r7 item 2).

Regenerates ``resources/gender_names.csv`` so that EVERY first name
appearing >= MIN_COUNT times (default 1 since r10 — every observed
name; was 2 in r9, 5 in r8) in the reference dataset's personnel
table is an explicit, reviewable decision:

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

Run:  python tools/vendor_gender_names.py [--min-count 1] [--dry-run]
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

# ---------------------------------------------------------------------------
# r9 second widening: curated labels for names observed exactly TWICE
# (census threshold 3 → 2). Same discipline; two-occurrence names in
# none of these lists are written as documented-declined 'unknown'.
# ---------------------------------------------------------------------------

_MALE += """
aanand aashish abdellah abdulla abdulmohsen abdur abe abhimanyu abu
ace adebayo ademola adil afonso aftab ahsan ajinkya ajit akin akio
akiva akram albrecht aleksander alfredo alon alper ambrose amitabh
amitabha ammar anatole angad angelo anirban aniruddha anirudh anjan
anshuman antoni antti anubhav anuj arif arkadiusz arnar arno arsenio
arshad asier asit atanu atharva atticus ayaz ayberk ayhan ayub babak
baptiste bart barun bas basil bassem bastian benson bentley beppe
berat bernd bharath bikramjeet birkan bjarne bogdan boman borja
braeden brando brendon brody bronson burgess carles carmelo carmine
carson carsten casper cassius cedric cemal cesare chaitanya chandler
chandrakant chang-hwan chapman chatchai chester chirag chittaranjan
ciaran ciro claes clem clovis coby collin colm cosme cosmo crispin
cristián dalip damián dario darragh darryl dash davide dejan delroy
demetri devendra dexter dharmendra dharmesh dheeraj dhirendra dhiru
diallo digvijay domenico donal drake dusan eamon eduard eldar elie
elliott elyes emad emanuele enric eoin erich erkan ervin erwin esben
etienne evans everardo ewen eyad ezequiel fabrice fadi fatih fathy
fayez fedor ferdi feroz firat florent flynn forrest fraser fredric
fritz fumihiko gaetano gage gautham gbenga ghassan gianluca gianni
gijs giorgi godfrey gord gorka gregorio grégory gus güven götz
hafeez hajime hallvard hamad hannes hardik hareesh harris
harshvardhan hatem hemanth henning henryk herbie herry hervé hideaki
hideyuki hitoshi ho-jin horacio hung husam hussien huub hüseyin idir
idris ike ikechukwu ilia ilkka indrajit iqbal irfan irshad ishaan
isiah ismael issa issac i̇brahim jace jagdeep jameel jarred jayan
jayant jayaprakash jean-baptiste jean-françois jefferson jens
jeremie jerod jeroen jett jimi joaquin johann john-paul johnathan
johny joko jonás joris josef joyraj juanjo judd jules junaid juraj
jérémy jürgen kaan kadeem kamil kamlesh karanvir kareem kashyap
kaustubh kavin kazuma keanu keiji keir keisuke kemal kenichi kenjiro
kenta kento kepa kerem kerr kitaro kiyoshi klaus koen koki kosuke
krish krishan kristoffer kristopher kunihiko lakeith lal lambert
lancelot lander latif lauri leif lennie leopoldo les lev levan
lincoln lonny ludovico ludovik luigi lukasz lyle lyman lyndon madan
maged magdy magnús mahavir mahendra mahir majdi maksim mamadou
mandla manikandan manop mansaku marcial marius marko marques mart
masaaki masahiko masaki masaru masaya mateo mathis matthieu maurizio
maurício maxim maxime mehmood mesut meyer mihai mikel mikkel minoru
mirosław mitsuaki mitsuo mohamad mohsin moritz mounir mourad moussa
muhammed muharrem munish murad murray máximo måns müfit nadeem
nadim nadir nagesh nakul nam-gil naman nandu nash nassar navid nazim
neville niels niklas nimai ninad nirmal nishikant nitin nitish
noam nobuaki nonso numa obi oded oguzhan ohad olli omero omkar oren oriol
orkun orson osamu padam palash pancho parambrata paritosh paxton
peppino percy piers piyush pongsatorn prabhu pradip praneet prasanna
prasanth prateik pratik prince priyadarshan priyanshu pulkit punit
puru raaghav rainer rajan ralf raman ramez ramsey ramzy ranbir
randal randhir randolph rasmus redouane reece reg reid reiner
reinout renan rendy renny reuben reza rik ringo rishabh ritchie
ritesh ritwik rizky robb robby robinson rocco romeo ronan rotimi
royce rudolf rui rupaul ryotaro ryuichi rıza saad sajid saket
samer samit samson samy sanath sandro santhosh saqib saravana
saurav saverio sawyer saúl scot sedat sello serge sergei sergey
sethu seán shaad shaan shad shadab shahid shailesh sheldon
shinnosuke shintaro shirish shishir shivaji shota shreeram shreyas
shrikant shubhankar siddarth siddhant sidharth slimane soham sohrab
soliman souleymane soumitra sreekanth sridhar stafford stanislav
stanisław stellan stu subbu sudheer sudip sudipto suhaas suhail
sujith sullivan sunder sushanth sushil swapnil sérgio tadeusz
tae-hwan tait takanori takaya takeo takeru takumi takuro tamir
tanvir tarsem tato tej tejas teun thabo thomás tiger timm timmy
tomokazu tomoki tomoya toshiki toygan toño trae tristán trond
tuncer tye uday uriel usher utkarsh utpal uwe uğur vadim vance
vatsal ved vidyut viju vikrant vineet vinoth vipul vishesh vishwas
vito vitthal wataru wendell wilfred willem wilmer wim winston
woo-sung wynton xander xavi yaser yash yasir yasuaki yasuhiro
yasushi yoel yogesh yoji yong-woo yoshihiko younes young-hoon yudai
yukitoshi yul yusuke yuta yutaro yuya yvan zaki zayn zbigniew
zdzislaw zeb zeeshan ziad zion zygmunt àlex ángel çetin édouard
ömer öner ümit
""".split()

_FEMALE += """
achita adeline adriane afra agata ahna aisha aisling aja akanksha
akemi alankrita alanna aleksandra alessia aline alisa allegra alli
ama amala amara amelie amina amita amparo amyra amélia anahí anika
anisha anja anjelica anne-marie anneliese anupama anusha apasiri
aradhana ariadna ariane arielle arisa artemis aruna arunima arushi
asami astrid asuman aswathy atsuko aura aurélie ayako ayisha bahar
banita barbora başak beena berna bernadette berrak bette
bhagyashree bharati bharti birgitte bo-ra bree brittney bronwen
brooklynn bushra bérénice caitlyn calista canan candy carina
carmela caro carole cayetana chantal charlize charo chelcie
chitrangada chloé chloë chrissy christa christel christie
clementine concha cornelia cosima cristine célia dalal danna danuta
dasha davina deanne deb debi deepa defne delfina della delnaaz
delphine denisse dianne dimple dinah dipti donia dora doria
déborah ebru eda edie ekta elana eleonore elham eliane elif elissa
satarupa
elli elly eloise elçin emerald emy enaam erinn ester eugenie evelin
evelyne ezgi faith farida farrah fathia fay federica fifi fify fina
flavia flor flora franziska françoise gargi gautami gayathri
geetanjali geetika genelia gigi ginger ginny giorgia gisela gizem
gözde graciela gracy gretchen grażyna gwendoline haifa haifaa
hailey halima hallie harleen hend henriette hermelinda hermione
hiam hilda hina hye-jin iben ignacia ikumi ilana ileana ines inés
inthira iria isla ivonne iza i̇dil jaclyn jacqui jamie-lee jamila
janine janna jeanine jeannie jenni jennie ji-a jigna jocelyne joely
joke jolie jonna jorja joselyn josie juhi jui justine kaho kaitlin
kalpana kamini kanae kanika karena karima karoline karrie karuna
kashmira kasia katerina katey katja kayli keira kika kimiko kinda
kira kirstin kishori kitty konomi krisha krista krystle kumiko
kumkum kunika kym lalita lavinia layla leonie leonora lesli leslye
letícia leïla lia liana lila liliane lilli lisette lizzy loni lora
lorene lorenza loretta louisa luana luise lynda maaike maaya macy
madonna mahima mahira maika maisa majida makenzie maki mamiko
mandakini manon mara maram marci mariah marianna maricel marika
mariko mariona marita marlee marwa maudy mavis mawar mayu mayuko
maïmouna maïwenn meena meesha mela melora menna meryl michela mila
milene milla milly mine misato missi mita mitzi miwa miya momoko
muriel médina mélissa naglaa nahed natali natalya natasa natascha
nathalia neelam neena neetu nell nelly nerea nergis neta niamh
nichole nicki nidia nil nisa noelia noelle noemi noorin nozomi
noémie nutan nya odessa odette olive oona opal oriana orla padmini
pamelyn parvati patrícia patsy paty paz pelin pepa peri perla
philippine phyllida pimchanok polina poppy porscha portia prachi
pratima praveena princess putri q'orianka queen ragaa rachelle
raveena rebekah reiko renuka reshma revathi rhiannon rhoda rhona
ritika roisin rola romy roselyn rossy roxy ruba rukhsar ryoko saara
saba sabine safia safinaz saidah sakura salli samara sameera samia
samiksha samina samriddhi sanaa sandrine sandrinna sangeetha sarita
sawsan sayumi scarlett selina sema serra seung-yeon shaimaa shaina
shailene shaily shama shari sheeba sheetal sherilyn sherine sherri
shikha shirin shizuka shona shraddha siena sissi sissy sita sloane
so-yeong soledad sonali sorcha souad srishti stefanie sudha
suhasini sulakshana sumitra sunita suparna surabhi surbhi susanna
susannah sushma sushmita suzan swara tabitha tallulah tami tanuja
tanushree tarra tasha tatiana tejaswini telma tinna trish trupti
tuba tuva tuğba tülay uma urvashi valentina valérie vasundhara
veronika viktoriya viviana vivienne vrinda wafaa welile wendi
wiktoria willa willow winnie xenia yasemin ye-jin yelena yoshimi
yousra yukari yumi yurika yuriko yuuka zahra zainab zarina zerrin
zita élodie ève öykü úrsula şenay
""".split()

_ANDY += """
a.j. a.r. aarya abi abir ade ady alix aly amari ami an ananda andie
andree ani arata arden asante aytaç b.n. baba baby bai baljinder
balu ban beck bergur big bilge bille bj black blaire bolaji bora
brune bucek bukky byeon c. c.j. cam camryn carmel cas chae chan
chanon charley charli chia chicco chico china chow choe christoffer
chuang cj corin cree d d. d.c. d.j. da dar dareen darcy daya dede
deddy debo del ding doğa dorien dougie duan edi eike
elisha eman g. g.k. geng gugu gulzar gunn gurinder hao harley harman
heo hetal hira hsu hua hui i ireti j.r. j.t. jae janis jasbir jaylin
jazz jazzy jc jessy ji-ho jian jin-young jinu jj joo jordyn jp jr
juju jung-min juno ka kabby kalani kanan kavi kayode keerthi kehinde
kendall kenya kid kimi kuan kuldeep kwak kwan kyung l. lao law le
lego lilian liron loren loreto lotus lovely lupe lyon m.j. mako mali
mana manjeet marin marley marlo marti masami matty mc meng
miao mizuki momo mr. n. naga navdeep neet nene nguyen
nozomu o.c. p. p.k. page pali pan patrice pei peng pepper
phoenix poon qin qiu r.j. ra rabbit
rae rahat rain randeep razor rez rica river roma ronit ronni
rupinder ry saman sascha saumya shamim shammi shay shaz
shea shiloh shiney shiny shu si sibongile skyler smith sola soni
soo-bin soo-hyun sri stef steph tae tai talat tam tang tanveer
tao taran taranjit tay tegan thanh tinu toa tolu trace tsai tsubasa
ungku uzor v veera vega vin viva wan wi wynn xia xian
xiang xie xin yani yee yemi yeon yeung yiğit you youn young yuma
yuu yuval zhan zul
""".split()

# r9 final sweep: the 78 observed names that fell through the two
# widening passes as auto-unknowns, now explicit decisions — after
# this, EVERY snapshot row traces to a curated list (the observed-
# names setdefault is a safety net, not a label source).
_MALE += """
archit avi andoni denny diaa diego francesc hengky hirofumi inigo
kaito kokoy loyiso mathieu ole olivier ravindra sabry sameh supoj
walid
""".split()

_FEMALE += """
angelique claudette céline indrani mrinmayee nandini niveditha rashi
sisca tomomi tomoyo tracee
""".split()

_ANDY += """
adebukola arkie atom bryn chen damilola falz fezile fumi garland
grand gökçe haru hayes honey in jaeden jing kaiwi kazumi ke kottayam
li liao loo lucky mandeep merritt miss nie ning puri ravel s. s.s.
sang shady silk son sukhbir sukhwinder udoka wofai xi zezé
""".split()

# ---------------------------------------------------------------------------
# r10 final sweep (VERDICT r9 item 1, census threshold 2 -> 1): every
# first name observed EXACTLY ONCE is an explicit decision too. The
# ~8.8k singleton dispositions live in tools/gender_singletons.py
# (3,720 male / 3,169 female / 1,890 reviewed-and-declined unknowns —
# numerals, band names, initials, surname-first tokens, ambiguous).
# After this merge the observed-names setdefault in build() is pure
# safety net: a name reaching it means the dataset changed.
# ---------------------------------------------------------------------------
try:
    from gender_singletons import DECLINED, FEMALE, MALE
except ImportError:  # invoked as tools/vendor_gender_names.py from repo root
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from gender_singletons import DECLINED, FEMALE, MALE

_MALE += MALE
_FEMALE += FEMALE
_ANDY += DECLINED

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
    # default 1 since r10 (census covers EVERY observed name); a
    # higher default would make the observed-names safety net skip
    # new singletons and leave the census test unfixable by re-run
    ap.add_argument("--min-count", type=int, default=1)
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
